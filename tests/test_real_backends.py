"""Opt-in real-backend tests (r4 VERDICT #4): everything hermetic in the
suite runs against injectable seams; these marked tests drive the REAL
backends when their prerequisites exist and skip cleanly otherwise.

* ``-m realllm`` — the real transformers/torch forward pass through
  generate_with_model's default loader. Needs importable torch +
  transformers AND $SPARK_GRAFT_REAL_LLM_MODEL (a chat-templated HF model
  id or local path, e.g. Qwen/Qwen2.5-0.5B-Instruct).
* ``-m realhttp`` — the real OpenAI Batch-API transport through
  OpenAIBatchClient. Needs the openai package AND $OPENAI_API_KEY. The
  test submits one minimal 2-task batch, polls the job status once, then
  CANCELS the job (Batch jobs can take hours; transport correctness —
  upload envelope accepted, job created, status readable, cancellation
  honored — is what the sandbox can never cover and what this pins).

The envelope/flattening translations inside the adapter stay pinned
hermetically in test_operators.py (TestBatchApi) — these tests exist only
for the last inch the injectable seams cannot reach.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest


def _has(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


REAL_LLM_MODEL = os.environ.get("SPARK_GRAFT_REAL_LLM_MODEL")


@pytest.mark.realllm
@pytest.mark.skipif(
    not (_has("torch") and _has("transformers") and REAL_LLM_MODEL),
    reason="needs torch + transformers + SPARK_GRAFT_REAL_LLM_MODEL",
)
def test_real_transformers_forward_pass(spark):
    """S15 tail: the default loader (_load_singleton) loads the real
    weights and the full wiring — left-pad batch tokenize -> generate ->
    decode -> eos fold -> response-template strip — produces a non-empty
    string per prompt with the prompt text stripped."""
    from generative_ner_spark.operators import llm

    prompts = spark.createDataFrame(
        [("e1", "Reply with the single word: hello"),
         ("e2", "Reply with the single word: world")],
        "example_id string, prompt_text string")
    out = llm.generate_with_model(
        prompts, REAL_LLM_MODEL, max_new_tokens=8).collect()
    got = {r.example_id: r.generated_text for r in out}
    assert set(got) == {"e1", "e2"}
    for eid, text in got.items():
        assert isinstance(text, str) and text.strip(), (eid, text)
        assert "Reply with the single word" not in text  # template stripped


@pytest.mark.realhttp
@pytest.mark.skipif(
    not (_has("openai") and os.environ.get("OPENAI_API_KEY")),
    reason="needs the openai package + OPENAI_API_KEY",
)
def test_real_batch_api_submit_poll_cancel(tmp_path):
    """S19 tail: OpenAIBatchClient speaks the live service through the
    SAME protocol surface submit_batches/poll_batches drive — upload a
    2-task file (envelope-wrapped), create the job, read its status, then
    cancel to avoid burning a 24h completion window in CI."""
    from generative_ner_spark.operators import batchapi

    task_file = tmp_path / "tasks.jsonl"
    with open(task_file, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "custom_id": f"task-{i}",
                "example_id": f"e{i}",
                "body": {
                    "model": "gpt-4o-mini-2024-07-18",
                    "temperature": 0.0,
                    "max_tokens": 16,
                    "top_p": 1.0,
                    "seed": 0,
                    "n": 1,
                    "messages": [
                        {"role": "user", "content": f"Say {i}."}],
                },
            }) + "\n")

    client = batchapi.OpenAIBatchClient(
        description="generative_ner_spark realhttp test")
    state = str(tmp_path / "batch_id_list.jsonl")
    bids = batchapi.submit_batches(client, str(task_file), state)
    assert len(bids) == 1
    status = client.batch_status(bids[0])
    assert status in {"validating", "in_progress", "finalizing",
                      "completed", "failed"}
    cancelled = client.client.batches.cancel(bids[0])
    assert cancelled.status in {"cancelling", "cancelled", "completed"}
