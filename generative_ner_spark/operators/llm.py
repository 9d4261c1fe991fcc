"""Real-LLM generation path (S12/S14/S15) — gated, worker-singleton pattern.

The container has no transformers/torch, so this module is import-safe and
raises a clear error only when generation is actually invoked without the
libraries. What IS always available and tested:

* ``detect_templates`` — pure string parity with the reference's chat-
  template-family detection (src/data/preprocessor.py:76-106): mistral
  ([INST]), llama (start_header_id), gemma (start_of_turn), chatml
  (im_start); unknown -> NotImplementedError, same as the reference.

The generation operator shows the production shape: model + tokenizer as
WORKER-GLOBAL singletons loaded once per executor python process (the
reference loads once per process at src/cli/run.py:53-60), Arrow micro-
batches sized by spark.sql.execution.arrow.maxRecordsPerBatch (the
batch_size flush of pred.py:98-103), left-padded batch tokenization and
response-template stripping per pred.py:13-29.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_WORKER_MODEL = {}  # per-python-worker singleton cache


def detect_templates(chat_template: str, need_instruction: bool = False
                     ) -> dict[str, str | None]:
    """Template-family detection, byte-parity with preprocessor.py:76-106."""
    out: dict[str, str | None] = {"instruction": None, "response": None}
    if "[INST]" in chat_template and "[/INST]" in chat_template:
        out["instruction"] = "[INST]"
        out["response"] = "[/INST]"
    elif "<|start_header_id|>" in chat_template and "<|end_header_id|>" in chat_template:
        out["instruction"] = "<|start_header_id|>user<|end_header_id|>"
        out["response"] = "<|start_header_id|>assistant<|end_header_id|>"
    elif "<start_of_turn>" in chat_template and "<end_of_turn>" in chat_template:
        out["instruction"] = "<start_of_turn>user\n"
        out["response"] = "<start_of_turn>model\n"
    elif "<|im_start|>" in chat_template and "<|im_end|>" in chat_template:
        out["instruction"] = "<|im_start|>user\n"
        out["response"] = "<|im_start|>assistant\n"
    else:
        raise NotImplementedError(
            f"Unknown chat template format: {chat_template}."
        )
    if not need_instruction:
        out["instruction"] = None
    return out


def _load_singleton(model_name: str):
    """Load model+tokenizer once per worker process (executor-side)."""
    if model_name in _WORKER_MODEL:
        return _WORKER_MODEL[model_name]
    try:
        import torch  # noqa: F401
        from transformers import AutoModelForCausalLM, AutoTokenizer
    except ImportError as e:  # pragma: no cover - no GPU libs in sandbox
        raise NotImplementedError(
            "transformers/torch not installed in this environment; "
            "generate_with_model needs them (the stub generator path in "
            "operators/detect.py is the hermetic substitute)"
        ) from e
    tok = AutoTokenizer.from_pretrained(model_name)
    model = AutoModelForCausalLM.from_pretrained(
        model_name, torch_dtype="auto", device_map="auto"
    )
    _WORKER_MODEL[model_name] = (tok, model)
    return tok, model


def generate_with_model(
    prompts: DataFrame,
    model_name: str,
    max_new_tokens: int = 512,
    prompt_col: str = "prompt_text",
    out_col: str = "generated_text",
) -> DataFrame:
    """mapInPandas generation with per-executor model singleton.

    Semantics per reference pred.py:13-29: batch tokenize with LEFT padding,
    generate, decode, strip everything up to the response template, strip().
    Arrow batch size == the reference's batch_size flush.
    """
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in prompts.schema.fields]
        + [f"{out_col} string"]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok, model = _load_singleton(model_name)
        resp = detect_templates(tok.chat_template)["response"]
        for pdf in batches:
            texts = list(pdf[prompt_col])
            enc = tok(texts, return_tensors="pt", padding=True,
                      padding_side="left").to(model.device)
            gen = model.generate(
                **enc, max_new_tokens=max_new_tokens,
                pad_token_id=tok.eos_token_id,
            )
            outs = []
            for tokens in gen:
                text = tok.decode(tokens).replace(tok.eos_token, "\n")
                outs.append(text.split(resp)[-1].strip())
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    return prompts.mapInPandas(fn, schema)
