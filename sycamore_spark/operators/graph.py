"""Graph extraction: entities/relationships out of documents into
nodes/edges tables.

Reference parity: ``extract_graph_entities`` (LLM pulls typed entities per
doc, reference: lib/sycamore/sycamore/transforms/extract_graph_entities.py:
207), ``extract_graph_relationships`` (extract_graph_relationships.py:286),
``resolve_graph_entities`` dedups entities across docs
(resolve_graph_entities.py:149); DocSet API docset.py:674,714,759; results
are written to Neo4j (writer.py:550) — here they're plain DataFrames any
sink can take.

Spark-first: extraction is one mapInPandas LLM stage per aspect; resolution
is a normalize + dropDuplicates (shuffle on the normalized key only);
relationship endpoints re-key by joining on the normalized name — a
hash join on the (small, deduped) node table, broadcast when it fits.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from sycamore_spark.llm.client import LLM
from sycamore_spark.llm.extract import extract_json

LLMFactory = Callable[[], LLM]


def _entity_prompt(types: list[str], text: str) -> str:
    return (
        f"Extract entities of types {types} from the document. Return JSON: "
        '[{"name": ..., "type": ...}].\nDocument: ' + text
    )


def _relationship_prompt(rel_types: list[str], text: str) -> str:
    return (
        f"Extract relationships of types {rel_types} between entities in the document. "
        'Return JSON: [{"src": ..., "dst": ..., "type": ...}].\nDocument: ' + text
    )


def _llm_json_stage(
    df: DataFrame,
    llm_factory: LLMFactory,
    make_prompt: Callable[[str], str],
    id_col: str,
    text_col: str,
    out_ddl: str,
    row_fn,
) -> DataFrame:
    def run(it: Iterable[pd.DataFrame]):
        llm = llm_factory()
        for pdf in it:
            replies = llm.generate_batch(
                [make_prompt("" if t is None else str(t)) for t in pdf[text_col]]
            )
            out: list[dict] = []
            for rid, reply in zip(pdf[id_col], replies):
                parsed = extract_json(reply)
                if not isinstance(parsed, list):
                    continue
                for item in parsed:
                    if isinstance(item, dict):
                        row = row_fn(rid, item)
                        if row is not None:
                            out.append(row)
            if out:
                yield pd.DataFrame(out)

    spark = df.sparkSession
    schema = spark.createDataFrame([], out_ddl).schema if isinstance(out_ddl, str) else out_ddl
    return df.mapInPandas(run, schema=schema)


def extract_graph_entities(
    df: DataFrame,
    llm_factory: LLMFactory,
    entity_types: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ mentions table (doc_id, name, type), one row per extracted entity
    mention (extract_graph_entities.py:31-148 semantics, mock-able)."""
    return _llm_json_stage(
        df,
        llm_factory,
        lambda t: _entity_prompt(entity_types, t),
        id_col,
        text_col,
        f"{id_col} long, name string, type string",
        lambda rid, item: (
            {id_col: rid, "name": str(item["name"]), "type": str(item.get("type", ""))}
            if "name" in item
            else None
        ),
    )


def extract_graph_relationships(
    df: DataFrame,
    llm_factory: LLMFactory,
    relationship_types: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ raw edges table (doc_id, src, dst, type)
    (extract_graph_relationships.py:286 semantics)."""
    return _llm_json_stage(
        df,
        llm_factory,
        lambda t: _relationship_prompt(relationship_types, t),
        id_col,
        text_col,
        f"{id_col} long, src string, dst string, type string",
        lambda rid, item: (
            {
                id_col: rid,
                "src": str(item["src"]),
                "dst": str(item["dst"]),
                "type": str(item.get("type", "")),
            }
            if "src" in item and "dst" in item
            else None
        ),
    )


def _norm(col):
    return F.trim(F.lower(col))


def resolve_graph_entities(mentions: DataFrame) -> DataFrame:
    """Dedup mentions into canonical nodes (resolve_graph_entities.py:149):
    normalize (lower/trim), group by (norm_name, type), keep the most
    frequent surface form, mint a stable content-hash node_id. One shuffle
    on the normalized key with map-side partial counts."""
    counted = mentions.groupBy(
        _norm(F.col("name")).alias("norm_name"), F.col("type")
    ).agg(
        F.count(F.lit(1)).alias("n_mentions"),
        # deterministic canonical surface form (lexicographic min)
        F.min("name").alias("canonical"),
    )
    return counted.select(
        F.sha2(F.concat_ws("|", "norm_name", "type"), 256).substr(1, 16).alias("node_id"),
        "canonical",
        "type",
        "norm_name",
        "n_mentions",
    )


def resolve_edges(edges: DataFrame, nodes: DataFrame, broadcast_nodes: bool = True) -> DataFrame:
    """Re-key raw (src,dst) surface forms to canonical node_ids by joining
    on the normalized name. The node table is the deduped entity set —
    usually small enough to broadcast; set broadcast_nodes=False for huge
    vocabularies (falls back to a shuffle hash join).

    Nodes are canonical per (norm_name, type) but raw edges carry only the
    surface name — a name that resolved to several entity types would fan
    each edge out into duplicate cross-typed edges. Dedupe to one node per
    norm_name first (most-mentioned wins, node_id tiebreak, deterministic).
    """
    from pyspark.sql.window import Window

    order = (
        [F.desc("n_mentions"), F.asc("node_id")]
        if "n_mentions" in nodes.columns
        else [F.asc("node_id")]
    )
    w = Window.partitionBy("norm_name").orderBy(*order)
    n = (
        nodes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("node_id", "norm_name")
    )
    if broadcast_nodes:
        n = F.broadcast(n)
    out = (
        edges.join(n.withColumnRenamed("node_id", "src_id"), _norm(F.col("src")) == F.col("norm_name"), "inner")
        .drop("norm_name")
        .join(
            n.withColumnRenamed("node_id", "dst_id"),
            _norm(F.col("dst")) == F.col("norm_name"),
            "inner",
        )
        .drop("norm_name")
    )
    return out.select("src_id", "dst_id", "type", edges.columns[0])


def extract_graph(
    df: DataFrame,
    llm_factory: LLMFactory,
    entity_types: list[str],
    relationship_types: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline → (nodes, edges) DataFrames ready for any sink
    (Neo4j writer parity seam, writer.py:550)."""
    mentions = extract_graph_entities(df, llm_factory, entity_types, id_col, text_col)
    nodes = resolve_graph_entities(mentions)
    raw_edges = extract_graph_relationships(df, llm_factory, relationship_types, id_col, text_col)
    return nodes, resolve_edges(raw_edges, nodes)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Power-iteration PageRank over an edge list — the domain-authority
    signal crawl pipelines use to weight sources (a la Common Crawl's
    harmonic-centrality seed ranking). Returns (node, rank_micros).

    Arithmetic is INTEGER end-to-end: ranks live in micro-units (start
    1_000_000 per node) and each edge contributes
    ``(rank * damping_pct) div (100 * out_degree)`` — BIGINT floor
    division, so partial-aggregation order can't perturb the result and
    the whole iteration replays bit-exactly in ANSI SQL (``//`` in
    DuckDB). Dangling nodes keep only the teleport term (no
    redistribution — documented variant).

    Scale shape: out-degrees and edges are computed once and cached; each
    iteration is one join (edges x current ranks, shuffle on src) + one
    hash agg on dst + a left join back to the node set, with ``lineage_cut``
    truncating the plan so it doesn't grow with iteration count. Pass
    ``checkpoint_dir`` (HDFS/S3A path) on a real cluster for a durable
    ``checkpoint()`` that survives executor loss mid-iteration; the default
    ``localCheckpoint`` is executor-volatile (local mode / tests). Skewed
    in-degree (a hub domain) is an AQE skew-join case, not a crash:
    contributions are pre-summed map-side.
    """
    from sycamore_spark.functions.partitioning import lineage_cut

    src, dst = F.col(src_col), F.col(dst_col)
    # hash-partition the cached edge list by source once: the
    # per-iteration rank join and the out-degree aggregate both key on
    # _src, so neither re-shuffles the edges again. (Local-mode note: the
    # query is scheduler-bound, not work-bound — three A/B'd variants
    # [fixed col-partitioning 6.2 s / AQE-only 9.1 s / size-aware
    # repartition 7.7 s at sf0.1] all spend most wall-clock launching
    # ~30 stages of tiny tasks, a cost that vanishes on a real graph.)
    e = (
        edges.select(src.alias("_src"), dst.alias("_dst"))
        .repartition(F.col("_src"))
        .persist()
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    ranks = nodes.withColumn("rank_micros", F.lit(1_000_000).cast("long"))
    teleport = int(round((100 - damping_pct) / 100 * 1_000_000))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["_src"] == ranks["node"])
            .join(deg, "_src")
            .select(
                F.col("_dst"),
                F.expr(
                    f"(rank_micros * CAST({damping_pct} AS BIGINT)) div "
                    f"(CAST(100 AS BIGINT) * _deg)"
                ).alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = lineage_cut(
            nodes.join(contribs, nodes["node"] == contribs["_dst"], "left")
            .select(
                "node",
                (F.lit(teleport).cast("long") + F.coalesce(F.col("_s"), F.lit(0))).alias(
                    "rank_micros"
                ),
            ),
            checkpoint_dir,
            # lazy cut: truncates lineage at each iteration boundary
            # without a per-iteration job barrier; the single eager
            # cut below materializes the whole chain in one job
            eager=False,
        )
    out = lineage_cut(ranks, checkpoint_dir, eager=True)
    e.unpersist()
    nodes.unpersist()
    return out


def triangle_count(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Global triangle count of the undirected graph — the standard
    cohesion/clustering metric for link and citation graphs. Returns one
    row (n_triangles bigint).

    Shape: canonicalize each undirected edge to (lo, hi) once (dedups
    reverse duplicates), then the classic two-join enumeration constrained
    to a < b < c so every triangle is counted exactly once. Both joins are
    hash equi-joins on a vertex id; degree skew (a hub vertex) is the AQE
    skew-join case. No driver state; at web scale the standard
    degree-ordering optimization (orient edges from lower- to higher-
    degree endpoints) drops the join fan-out further — the a<b<c ordering
    here is its id-ordered special case."""
    lo, hi = F.least(F.col(src_col), F.col(dst_col)), F.greatest(F.col(src_col), F.col(dst_col))
    e = (
        edges.filter(F.col(src_col) != F.col(dst_col))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )
    e1 = e.alias("e1")
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("e2")
    e3 = e.select(F.col("a").alias("a2"), F.col("b").alias("c2")).alias("e3")
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def kcore(
    edges: DataFrame,
    k: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete every
    node with (undirected, deduped) degree < k; what survives is the
    maximal subgraph where everyone has >= k neighbors — the standard
    dense-community / spam-farm detector on link graphs, and the graph
    twin of "drop docs whose dup-cluster support is thin".

    Runs a FIXED ``rounds`` of peeling (each round: one degree hash-agg +
    two semi-joins to drop edges touching peeled nodes, lineage cut per
    round like ``pagerank``). Peeling is confluent — deletion order never
    changes the fixpoint — and each non-final round strictly shrinks the
    node set, so the exact k-core is reached once rounds >= peeling depth
    (small for real graphs; bounded replay is also what keeps the result
    a deterministic pure function of (edges, k, rounds), exactly
    replayable in unrolled SQL). Returns (node, degree) of survivors
    after ``rounds``.
    """
    from sycamore_spark.functions.partitioning import lineage_cut

    lo, hi = F.least(F.col(src_col), F.col(dst_col)), F.greatest(F.col(src_col), F.col(dst_col))
    e = (
        edges.filter(F.col(src_col) != F.col(dst_col))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )
    e = lineage_cut(e, checkpoint_dir)
    n_edges = e.count()
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("n")).union(e.select(F.col("b")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        keep = deg.filter(F.col("_d") >= k).select("n")
        e = lineage_cut(
            e.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .select("a", "b"),
            checkpoint_dir,
        )
        # peeling only REMOVES edges, so an unchanged count IS the
        # fixpoint — stop early (identical result to running all rounds;
        # the count is one cheap job over the just-materialized cut)
        n_now = e.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    deg = (
        e.select(F.col("a").alias("node")).union(e.select(F.col("b")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return deg.filter(F.col("degree") >= k)
