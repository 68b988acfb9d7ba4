"""Full reference prompt texts, selectable per pipeline run.

The reference ships its prompts as importable template modules
(LLMxMapReduce_V2/src/prompts/base.py: a ``PromptManager`` singleton picks
``prompts_{lang}`` via the ``PROMPT_LANGUAGE`` env var) plus per-task V1
YAML configs (LLMxMapReduce_V1/config/*.yaml: ``map_prompt`` /
``collapse_prompt`` / ``reduce_prompt``).  This package carries both,
verbatim:

- :mod:`prompts_en` / :mod:`prompts_zh` — the V2/V3 survey, search and
  crawl templates (19 named ``*_PROMPT`` strings each);
- ``v1/*.yaml`` — the V1 task configs (qa, qa_zh, math, code, sum,
  retrieval) whose prompt keys drive the map→collapse→reduce pipeline.

The pipelines default to short condensed templates (deterministic
test/mock contract — the correctness goldens hash the mock replies, which
hash the prompts).  Production runs opt into the reference texts with
``V2Config(full_prompts=True, prompt_lang="en")`` or by passing
``prompts=v1_prompts("qa")`` to :func:`run_v1_qa`.  Template strings are
resolved ON THE DRIVER and captured into the stage closures, so the
selection works identically on a real cluster (no executor-side globals).
"""

from __future__ import annotations

import os
from importlib import import_module

DEFAULT_LANGUAGE = "en"
ENV_VAR_NAME = "PROMPT_LANGUAGE"     # reference base.py:53
LANGUAGES = ("en", "zh")


def get_module(lang: str | None = None):
    """The verbatim template module for ``lang`` (default: the
    ``PROMPT_LANGUAGE`` env var, the reference's selection mechanism),
    falling back to English on an unknown language like base.py:64-75."""
    lang = lang or os.getenv(ENV_VAR_NAME, DEFAULT_LANGUAGE)
    if lang not in LANGUAGES:
        lang = DEFAULT_LANGUAGE
    return import_module(f"llmxmapreduce_spark.prompts.prompts_{lang}")


def template(name: str, lang: str | None = None) -> str:
    """One named reference template (e.g. ``"INIT_OUTLINE_PROMPT"``)."""
    return getattr(get_module(lang), name)


def render(name: str, lang: str | None = None, **slots) -> str:
    """Format a reference template with the reference's own placeholder
    names (``title``, ``abstracts``, ``old_outline``, …)."""
    return template(name, lang).format(**slots)


_V1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "v1")
V1_TASK_CONFIGS = ("qa", "qa_zh", "math", "code", "sum", "retrieval")


def v1_prompts(task: str = "qa") -> dict[str, str]:
    """The V1 map/collapse/reduce prompt texts for one task config
    (reference config/{task}.yaml) as ``{"map": …, "collapse": …,
    "reduce": …}`` — each a ``{context}``/``{question}`` template."""
    import yaml

    if task not in V1_TASK_CONFIGS:
        raise ValueError(f"unknown V1 task config: {task!r}; "
                         f"one of {V1_TASK_CONFIGS}")
    with open(os.path.join(_V1_DIR, f"{task}.yaml"), encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    return {k: cfg[f"{k}_prompt"] for k in ("map", "collapse", "reduce")}
