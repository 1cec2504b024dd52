"""Distributed BPE tokenizer training and encoding.

The classic byte-pair-encoding trainer (Sennrich et al. 2016, the algorithm
behind the reference's tiktoken/HuggingFace tokenizer backends —
reference functions/tokenizer.py delegates to those libraries; this is the
train-your-own half a 100 TB corpus pipeline needs) reduced to Spark
primitives:

1. ONE corpus-scale shuffle builds the word-frequency table — after that,
   every merge round runs on the compact word-TYPE table (vocabulary-sized,
   millions of rows at worst), never the corpus again.
2. Each word is held as a symbol string where EVERY symbol owns both its
   flanking spaces (``" h  e  l  l  o "`` — double spaces between symbols).
   Counting a round's adjacent-pair frequencies is split + zip + explode +
   one hash agg (map-side combine collapses the pair stream before the
   shuffle); the winning pair is ONE collected row (bounded by construction).
3. Applying a merge is a literal replace of ``" a  b "`` with ``" ab "``.
   Because adjacent matches never share characters under this layout,
   leftmost-non-overlapping replace IS the canonical single-pass greedy
   merge (the semantics of the reference algorithm's ``re.sub`` with
   zero-width boundaries) — and it is bit-replayable in any engine with
   standard replace semantics (the DuckDB oracle unrolls the same rounds).
   A shared-delimiter layout (single spaces) would diverge on runs of a
   repeated symbol; the double-space invariant is what makes the replace
   exact.

Scale shape: N merge rounds = N tiny aggregations over the word-type table
+ N one-row collects. The symbol column is lineage-cut every few rounds so
plan depth stays constant (same discipline as pagerank/kcore; pass
``checkpoint_dir`` for durable cuts on a cluster). No corpus rescans, no
windows, no driver-side loops over data — the only driver state is the
learned merge list itself (the model, kilobytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sycamore_spark.functions.partitioning import fan_out, lineage_cut

__all__ = ["word_frequencies", "bpe_train", "bpe_encode"]

# Word-boundary marker for whole-corpus encoding; US control char, never a
# corpus symbol (stripped defensively from input text).
_BOUNDARY = "\x1f"


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus → word-TYPE frequency table (w, f). The one corpus-scale
    shuffle of BPE training; everything after runs on this compact table."""
    c = F.trim(F.col(text_col))
    if lowercase:
        c = F.lower(c)
    return (
        df.select(F.explode(F.split(c, r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def _sym_col(w) -> F.Column:
    # "hello" -> " h  e  l  l  o ": each char becomes " c ", so every
    # symbol owns its flanking spaces and merge-replaces never overlap.
    return F.regexp_replace(w, "(.)", " $1 ")


def _pair_counts(sym: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.col("s")), "  ")
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(toks, 1, n).alias("a"), F.slice(toks, 2, n).alias("b")
    )
    return (
        sym.select("f", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("left"), F.col("p.b").alias("right"))
        .agg(F.sum("f").alias("pair_count"))
    )


def _merge_expr(stream, left: str, right: str) -> F.Column:
    return F.replace(
        stream, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    lowercase: bool = True,
    cut_every: int = 4,
    checkpoint_dir: str | None = None,
) -> list[dict]:
    """Learn ``num_merges`` BPE merges over the corpus. Returns the merge
    table (the model) as a list of dicts: round (1-based), left, right,
    merged, pair_count — deterministic (ties broken by (left, right) asc).

    Stops early when no pair remains (all words fused to single symbols).
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    wf = word_frequencies(df, text_col, lowercase=lowercase)
    sym = wf.select(_sym_col(F.col("w")).alias("s"), "f").persist()
    merges: list[dict] = []

    def _best(frame: DataFrame):
        # ONE action per round: the best-pair collect both finds the next
        # merge and materializes the (lazily) persisted/checkpointed symbol
        # table it runs over, so the previous round's cache can be released
        # without a separate .count() job (r13: was 2 jobs per round).
        return (
            _pair_counts(frame)
            .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )

    try:
        best = _best(sym)
        for rnd in range(1, num_merges + 1):
            if not best:
                break
            a, b, cnt = best[0].left, best[0].right, best[0].pair_count
            merges.append(
                {
                    "round": rnd,
                    "left": a,
                    "right": b,
                    "merged": a + b,
                    "pair_count": int(cnt),
                }
            )
            if rnd == num_merges:
                break  # model complete: the next symbol table is never needed
            nxt = sym.select(_merge_expr(F.col("s"), a, b).alias("s"), "f")
            if rnd % cut_every == 0:
                # lazy cut: with the default localCheckpoint this truncates
                # lineage when the next best-collect materializes it (no
                # extra job). With a durable checkpoint_dir the reliable
                # checkpoint still runs its own job after that collect —
                # durability costs one job per cut round (the cluster
                # fault-tolerance trade documented in lineage_cut).
                nxt = lineage_cut(nxt, checkpoint_dir, eager=False)
            else:
                nxt = nxt.persist()
            best = _best(nxt)  # materializes nxt while sym is still cached
            sym.unpersist()
            sym = nxt
    finally:
        sym.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a learned merge list to the corpus and count BPE tokens per
    document → (id_col, bpe_tokens bigint, words bigint).

    The merge chain is a fixed stack of literal replaces over the per-doc
    symbol stream — pure codegen string work, zero shuffle, linear in
    corpus size; the model rides along as expression literals (kilobytes),
    the distributed analogue of broadcasting the tokenizer. Words are
    separated by a control-char boundary symbol so no merge can straddle a
    word boundary; merges apply in learned order, exactly like the
    reference's tokenizer backends replay their merge ranks.
    """
    # The replace chain is CPU-heavy string codegen: widen a
    # single-file extract so it doesn't run on one core (no-op on
    # well-partitioned cluster inputs).
    df = fan_out(df)
    c = F.trim(F.col(text_col))
    if lowercase:
        c = F.lower(c)
    c = F.regexp_replace(c, _BOUNDARY, "")  # defensive: reserve the marker
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    # " h  i  \x1f  y  o " — every symbol (and the boundary) owns its
    # flanking spaces, preserving the non-overlap invariant of training.
    stream = F.regexp_replace(
        F.concat_ws(f" {_BOUNDARY} ", words), f"([^ {_BOUNDARY}])", " $1 "
    )
    for m in merges:
        stream = _merge_expr(stream, m["left"], m["right"])
    n_tokens = F.size(
        F.filter(F.split(F.trim(stream), "  "), lambda t: t != _BOUNDARY)
    )
    return df.select(
        F.col(id_col),
        F.when(F.size(words) == 0, F.lit(0).cast("long"))
        .otherwise(n_tokens.cast("long"))
        .alias("bpe_tokens"),
        F.size(words).cast("long").alias("words"),
    )


def tokenizer_fertility(
    df: DataFrame,
    merges: list[dict],
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer FERTILITY — subword tokens per whitespace word
    (Rust et al. 2021, "How Good is Your Tokenizer?" §3.1): the standard
    diagnostic for how well a trained tokenizer serves each language/
    domain slice of a corpus (high fertility = the group pays more
    sequence length per word, i.e. the tokenizer under-serves it — the
    measurement UniMax/temperature mixture decisions want next to token
    counts). Corpus-level ratio per group: sum(bpe_tokens) / sum(words),
    micro-quantized; NULL when a group has no words.

    Scale shape: ``bpe_encode``'s zero-shuffle literal-replace chain (the
    model rides as expression literals) + ONE id-keyed join to re-attach
    the group column + one hash aggregate — corpus-linear, nothing
    collects. Returns (group_col, n_docs, bpe_tokens, words,
    fertility_micros)."""
    enc = bpe_encode(df, merges, id_col=id_col, text_col=text_col)
    g = df.select(F.col(id_col), F.col(group_col))
    agg = enc.join(g, id_col).groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
        F.sum("words").cast("long").alias("words"),
    )
    fert = F.when(
        F.col("words") > 0,
        F.floor(
            F.col("bpe_tokens").cast("double") / F.col("words") * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    )
    return agg.withColumn("fertility_micros", fert)
