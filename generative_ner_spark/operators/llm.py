"""Real-LLM generation path (S12/S14/S15) — gated, worker-singleton pattern.

The container has no transformers/torch, so this module is import-safe and
raises a clear error only when generation is actually invoked without the
libraries. What IS always available and tested:

* ``detect_templates`` — pure string parity with the reference's chat-
  template-family detection (src/data/preprocessor.py:76-106): mistral
  ([INST]), llama (start_header_id), gemma (start_of_turn), chatml
  (im_start); unknown -> NotImplementedError, same as the reference.
* ``render_chat_template`` / ``with_rendered_prompt`` — REAL chat-template
  rendering via sandboxed jinja2 (the documented public contract of
  tokenizer.apply_chat_template(tokenize=False)); only the forward pass
  itself remains torch-gated.

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


def _template_env():
    """The sandboxed jinja environment apply_chat_template documents:
    ImmutableSandboxedEnvironment + trim/lstrip blocks + a raise_exception
    global (real model templates use it to reject unsupported turns). One
    definition shared by the pure renderer and the Spark column operator so
    the two can never diverge."""
    from jinja2.sandbox import ImmutableSandboxedEnvironment

    def raise_exception(message: str):
        raise ValueError(message)

    env = ImmutableSandboxedEnvironment(trim_blocks=True, lstrip_blocks=True)
    env.globals["raise_exception"] = raise_exception
    return env


def render_chat_template(
    messages: list[dict[str, str]],
    chat_template: str,
    add_generation_prompt: bool = True,
    bos_token: str = "",
    eos_token: str = "",
) -> str:
    """Render chat messages through a model's jinja chat template WITHOUT
    transformers/torch.

    This is the documented public contract of
    ``tokenizer.apply_chat_template(..., tokenize=False)``: the template
    string is compiled in a jinja2 ImmutableSandboxedEnvironment with
    ``trim_blocks``/``lstrip_blocks``, a ``raise_exception`` hook (real
    templates use it to reject e.g. unsupported system turns), and is
    rendered with ``messages`` / ``add_generation_prompt`` / ``bos_token``
    / ``eos_token`` variables. De-gates the RENDER half of S12 (reference
    src/data/preprocessor.py:76-106 + pred.py:13-29): the only part that
    still needs torch is the forward pass itself (generate_with_model).
    """
    return _template_env().from_string(chat_template).render(
        messages=messages,
        add_generation_prompt=add_generation_prompt,
        bos_token=bos_token,
        eos_token=eos_token,
    )


def with_rendered_prompt(
    prompts: DataFrame,
    chat_template: str,
    prompt_col: str = "prompt",
    out_col: str = "prompt_text",
    add_generation_prompt: bool = True,
    bos_token: str = "",
    eos_token: str = "",
) -> DataFrame:
    """Column form of render_chat_template: (prompt array<struct<role,
    content>>) -> rendered prompt_text, in Arrow batches with the template
    compiled ONCE per python worker (never per row). Feeds
    generate_with_model's ``prompt_col`` — together they are the reference's
    apply_chat_template -> generate chain as a Spark stage."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in prompts.schema.fields
    )
    schema = f"{fields}, {out_col} string"
    _tmpl_cache: dict = {}

    def fn(batches):
        if "t" not in _tmpl_cache:
            _tmpl_cache["t"] = _template_env().from_string(chat_template)
        tmpl = _tmpl_cache["t"]
        for pdf in batches:
            rendered = [
                tmpl.render(
                    messages=[{"role": m["role"], "content": m["content"]}
                              for m in msgs],
                    add_generation_prompt=add_generation_prompt,
                    bos_token=bos_token,
                    eos_token=eos_token,
                )
                for msgs in pdf[prompt_col]
            ]
            out = pdf.copy()
            out[out_col] = rendered
            yield out

    return prompts.mapInPandas(fn, schema)


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
    loader=None,
) -> DataFrame:
    """mapInPandas generation with per-executor model singleton.

    Semantics per reference pred.py:13-29: batch tokenize with LEFT padding,
    generate, decode, strip everything up to the response template, strip().
    Arrow batch size == the reference's batch_size flush.

    ``loader``: injectable ``(model_name) -> (tokenizer, model)`` factory,
    defaulting to the torch/transformers worker singleton. Production
    never passes it; the test suite injects a pure-python fake speaking
    the same tokenizer/model API, so the FULL wiring — left-padded batch
    tokenize -> generate -> decode -> eos fold -> response-template strip
    — executes and is pinned without torch in the environment. Only the
    real HF weight load stays env-gated.
    """
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in prompts.schema.fields]
        + [f"{out_col} string"]
    )
    load = loader or _load_singleton

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok, model = load(model_name)
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
