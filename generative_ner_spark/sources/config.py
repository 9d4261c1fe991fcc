"""YAML config parity with the reference's argparser (src/argparser.py:53-102).

The reference drives run_gpt.py from a single YAML file with ``gpt_model``
and ``dataset`` sections (configs/config_gpt.yaml) plus CLI ``--output_dir``
and ``--mode``. This module parses THAT exact shape into plain dataclasses so
a user can point the Spark CLI at their existing reference config verbatim:

    spark-submit ... jobs/run_gpt_spark.py -c configs/config_gpt.yaml \\
        -o /tmp/out -m estimate --input synth:200

CLI flags override config values; the config supplies the defaults. The
``train_file``/``validation_file``/``test_file`` entries are carried but not
auto-loaded — the Spark CLI's ``--input`` names the corpus (the reference's
JSONL example files use a different storage layout than the interleaved-doc
tables this engine reads; jobs/convert_conll.py produces compatible input).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class DatasetArgs:
    """Mirror of the reference's DatasetArguments (argparser.py:17-24)."""

    train_file: Optional[str] = None
    validation_file: Optional[str] = None
    test_file: Optional[str] = None
    language: str = "en"
    format: str = "collective"
    labels2names: Optional[dict] = None
    system_prompt: Optional[str] = None


@dataclass
class GptModelArgs:
    """Mirror of the reference's GptModelArguments (argparser.py:38-50);
    ``output_dir`` and ``mode`` come from the CLI, as in parse_args_gpt."""

    model_name: str = "gpt-4o-mini-2024-07-18"
    total_cost_limit: float = 1.0
    top_p: float = 0.9
    temperature: float = 0.2
    seed: int = 0
    k: int = 2
    n: int = 1
    max_token_length: int = 4096
    cache_dir: Optional[str] = None
    mode: str = "estimate"
    output_dir: Optional[str] = None


def load_gpt_config(path: str) -> tuple[DatasetArgs, GptModelArgs]:
    """Parse a reference-shaped config_gpt.yaml (argparser.py:74-102).

    Accepts the reference's own configs/config_gpt.yaml byte-for-byte:
    pops ``dataset`` and ``gpt_model`` sections into the dataclasses,
    rejecting unknown keys the same way dataclass(**kwargs) does.
    """
    import yaml

    with open(path) as f:
        config = yaml.safe_load(f)
    data_config = config.pop("dataset", {}) or {}
    model_config = config.pop("gpt_model", {}) or {}
    return DatasetArgs(**data_config), GptModelArgs(**model_config)
