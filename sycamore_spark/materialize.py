"""AutoMaterialize: automatic checkpointing around expensive (LLM) stages.

Reference parity: ``AutoMaterialize`` (reference:
lib/sycamore/sycamore/materialize.py:623-700) is a Ray plan-rewrite rule that
wraps every node in a Materialize; ``MaterializeReadReliability`` (:47)
re-sources retries from the stored copy. This engine composes DataFrames
eagerly, so the rule is a *stage decorator* instead of a graph traversal:
while enabled, every llm_map-family stage writes its output to
``<root>/<stage-hash>`` parquet and any rerun whose stage key matches an
existing complete checkpoint (parquet ``_SUCCESS`` marker — the reference's
completeness marker) reads the stored result instead of re-invoking the LLM.

The stage key hashes (kind, prompt, output column, input schema, optional
user name) — the same stage re-run after a driver crash resolves to the same
directory, which is exactly the kill-and-resume contract. Two different
pipelines with identical prompt+schema should pass distinct ``name``s, the
same caveat the reference documents for its auto-generated node names.

Scale note: a checkpoint is one distributed parquet write + read — no
driver funnel; at 100 TB this is the cheap insurance that keeps a 6-hour
LLM stage from rerunning because a downstream join OOMed.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from pyspark.sql import DataFrame

_ACTIVE: Optional["AutoMaterialize"] = None


class AutoMaterialize:
    def __init__(self, root: str, source_mode: str = "USE_STORED"):
        self.root = root
        self.source_mode = source_mode

    # -- stage key ----------------------------------------------------------

    def stage_dir(self, kind: str, *key_parts: str) -> str:
        digest = hashlib.sha256("\x1f".join([kind, *key_parts]).encode()).hexdigest()[:16]
        return os.path.join(self.root, f"{kind}-{digest}")

    # -- checkpoint protocol -------------------------------------------------

    def try_read(self, df_like: DataFrame, path: str) -> Optional[DataFrame]:
        """Return the stored stage output iff complete and USE_STORED."""
        if self.source_mode != "USE_STORED":
            return None
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return df_like.sparkSession.read.parquet(path)
        return None

    def write(self, df: DataFrame, path: str) -> DataFrame:
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)


def enable(root: str, source_mode: str = "USE_STORED") -> AutoMaterialize:
    """Turn on auto-checkpointing for subsequently-built LLM stages."""
    global _ACTIVE
    _ACTIVE = AutoMaterialize(root, source_mode)
    return _ACTIVE


def disable() -> None:
    global _ACTIVE
    _ACTIVE = None


def active() -> Optional[AutoMaterialize]:
    return _ACTIVE


def checkpoint_stage(build, df: DataFrame, kind: str, *key_parts: str, name: str | None = None) -> DataFrame:
    """Wrap one stage: reuse the stored output when the stage key matches a
    complete checkpoint, else build + store. ``build`` is a zero-arg callable
    returning the stage's output DataFrame (only invoked on a miss)."""
    am = active()
    if am is None:
        return build()
    schema_sig = df.schema.simpleString()
    parts = [schema_sig, *key_parts] + ([name] if name else [])
    path = am.stage_dir(kind, *parts)
    stored = am.try_read(df, path)
    if stored is not None:
        return stored
    return am.write(build(), path)
