"""store_sync: the generic store-reconciliation operator (the reference's
OpenSearch materialize-dir ↔ index sync algorithm, connectors/opensearch/
sync.py, re-expressed as two hash aggs + one full-outer join)."""

import hashlib

from pyspark.sql import functions as F

from sycamore_spark.operators.storesync import store_sync, sync_key, sync_stats

SEP = "\x1f"


def _key(mtime, parts):
    return hashlib.sha256(
        (str(mtime) + SEP + SEP.join(sorted(parts))).encode()
    ).hexdigest()


def _frames(spark):
    """One source/md/dest fixture exercising every classification:

    d1 correctly_loaded (root + 2 split pieces, key matches)
    d2 missing_md_info  (no metadata record)
    d3 stale md         (record mtime 9 != file mtime 10) -> missing_md_info
    d4 missing_os_record (valid record, no dest group)
    d5 mismatch_key     (dest lost one split piece -> pieces purged)
    d6 duplicate md records -> missing_md_info
    d7 dest group carries doc_mtime on TWO pieces -> keys as -1 -> mismatch
    x9 dest-only group  -> only_in_os purge
    """
    src = spark.createDataFrame(
        [("d%d" % i, 10) for i in range(1, 8)], "doc_id string, mtime long"
    )
    md = spark.createDataFrame(
        [
            ("d1", 10, _key(10, ["d1", "s1a", "s1b"])),
            ("d3", 9, _key(9, ["d3"])),
            ("d4", 10, _key(10, ["d4"])),
            ("d5", 10, _key(10, ["d5", "s5a", "s5b"])),
            ("d6", 10, _key(10, ["d6"])),
            ("d6", 10, _key(10, ["d6", "s6a"])),
            ("d7", 10, _key(10, ["d7", "s7a"])),
        ],
        "doc_id string, mtime long, sync_key string",
    )
    dest = spark.createDataFrame(
        [
            ("d1", None, 10),
            ("s1a", "d1", None),
            ("s1b", "d1", None),
            ("d2", None, 10),
            ("d3", None, 10),
            ("d5", None, 10),
            ("s5a", "d5", None),  # s5b lost -> sorted-hash mismatch
            ("d6", None, 10),
            ("d7", None, 10),
            ("s7a", "d7", 10),  # duplicate doc_mtime -> group keys as -1
            ("x9", None, 3),
            ("s9a", "x9", None),
        ],
        "doc_id string, parent_id string, doc_mtime long",
    )
    return src, md, dest


def test_store_sync_classifies_every_case(spark):
    src, md, dest = _frames(spark)
    plan = store_sync(src, dest, md)
    docs = {r.sync_id: r for r in plan.filter(F.col("kind") == "doc").collect()}
    assert docs["d1"].status == "correctly_loaded" and docs["d1"].action == "none"
    assert docs["d2"].status == "missing_md_info" and not docs["d2"].stale_md
    assert docs["d3"].status == "missing_md_info" and docs["d3"].stale_md
    assert docs["d4"].status == "missing_os_record" and docs["d4"].action == "load"
    assert docs["d5"].status == "mismatch_key" and docs["d5"].action == "load"
    assert docs["d6"].status == "missing_md_info" and not docs["d6"].stale_md
    assert docs["d7"].status == "mismatch_key"
    assert len(docs) == 7

    pieces = {
        r.sync_id: r.status for r in plan.filter(F.col("kind") == "piece").collect()
    }
    # mismatch groups purge their CURRENT pieces; dest-only groups purge all
    assert pieces == {
        "d5": "mismatch_key",
        "s5a": "mismatch_key",
        "d7": "mismatch_key",
        "s7a": "mismatch_key",
        "x9": "only_in_os",
        "s9a": "only_in_os",
    }


def test_store_sync_no_metadata_means_reload_everything(spark):
    src, _, dest = _frames(spark)
    plan = store_sync(src, dest, source_md=None)
    docs = plan.filter(F.col("kind") == "doc").collect()
    assert all(r.status == "missing_md_info" and r.action == "load" for r in docs)
    assert len(docs) == 7


def test_store_sync_piece_order_does_not_change_key(spark):
    """sync_key sorts piece ids: a destination listing in any order matches
    the same recorded key (the reference sorts before hashing)."""
    k1 = _key(10, ["a", "b", "c"])
    rows = [(10, ["c", "a", "b"]), (10, ["a", "b", "c"])]
    sdf = (
        spark.createDataFrame(rows, "mtime long, parts array<string>")
        .select(sync_key(F.col("mtime"), F.col("parts")).alias("k"))
        .collect()
    )
    assert sdf[0].k == sdf[1].k == k1


def test_store_sync_split_change_detected_via_sorted_hash(spark):
    """The split-aware rule: same root doc id, same mtime, but the split
    produced a different piece SET -> reload (the reference's reason for
    hashing sorted piece ids rather than comparing counts)."""
    src = spark.createDataFrame([("d1", 5)], "doc_id string, mtime long")
    md = spark.createDataFrame(
        [("d1", 5, _key(5, ["d1", "p_old"]))],
        "doc_id string, mtime long, sync_key string",
    )
    dest = spark.createDataFrame(
        [("d1", None, 5), ("p_new", "d1", None)],
        "doc_id string, parent_id string, doc_mtime long",
    )
    plan = store_sync(src, dest, md)
    doc = plan.filter(F.col("kind") == "doc").first()
    assert doc.status == "mismatch_key"
    purged = {r.sync_id for r in plan.filter(F.col("kind") == "piece").collect()}
    assert purged == {"d1", "p_new"}


def test_sync_stats_rollup(spark):
    src, md, dest = _frames(spark)
    stats = {
        (r.kind, r.status): (r.n, r.n_stale_md)
        for r in sync_stats(store_sync(src, dest, md)).collect()
    }
    assert stats[("doc", "missing_md_info")] == (3, 1)
    assert stats[("doc", "correctly_loaded")] == (1, 0)
    assert stats[("doc", "mismatch_key")] == (2, 0)
    assert stats[("doc", "missing_os_record")] == (1, 0)
    assert stats[("piece", "only_in_os")] == (2, 0)
    assert stats[("piece", "mismatch_key")] == (4, 0)


def test_docset_methods_store_sync_and_bin_pack(spark):
    from sycamore_spark.docset import DocSet

    src, md, dest = _frames(spark)
    plan = DocSet(src).store_sync(DocSet(dest), DocSet(md)).to_df()
    assert plan.filter(plan.kind == "doc").count() == 7

    docs = spark.createDataFrame(
        [(1, 80), (2, 40), (3, 90)], "doc_id long, sz long"
    )
    out = DocSet(docs).bin_pack("sz", 128).to_df()
    # FFD order 90,80,40: 90 alone (80 doesn't fit), then 80+40 share a bin
    assert {r.doc_id: r.bin_count for r in out.collect()} == {1: 2, 2: 2, 3: 1}


def test_store_sync_randomized_against_reference(spark):
    """Randomized reconciliation vs a driver-side replay of the reference
    algorithm (connectors/opensearch/sync.py classification rules), over
    random add/update/delete/split perturbations."""
    import random

    rnd = random.Random(20260816)
    src_rows, md_rows, dest_rows = [], [], []
    expect_docs = {}
    expect_del = {}
    for i in range(200):
        did = f"d{i}"
        mt = rnd.randint(1, 5)
        src_rows.append((did, mt))
        parts = [did] + [f"s{i}_{j}" for j in range(rnd.randint(0, 3))]
        case = rnd.choice(
            ["ok", "no_md", "stale", "dup_md", "no_dest", "split_change"]
        )
        if case != "no_md":
            md_mt = mt - 1 if case == "stale" else mt
            md_rows.append((did, md_mt, _key(md_mt, parts)))
            if case == "dup_md":
                md_rows.append((did, mt, _key(mt, [did])))
        dest_parts = parts if case != "split_change" else parts + [f"x{i}"]
        if case != "no_dest":
            dest_rows.append((dest_parts[0], None, mt))
            for p in dest_parts[1:]:
                dest_rows.append((p, did, None))
        if case in ("no_md", "dup_md"):
            expect_docs[did] = "missing_md_info"
        elif case == "stale":
            expect_docs[did] = "missing_md_info"
        elif case == "no_dest":
            expect_docs[did] = "missing_os_record"
        elif case == "split_change":
            expect_docs[did] = "mismatch_key"
            for p in dest_parts:
                expect_del[p] = "mismatch_key"
        else:
            expect_docs[did] = "correctly_loaded"
    for i in range(20):  # dest-only groups
        dest_rows.append((f"z{i}", None, 9))
        expect_del[f"z{i}"] = "only_in_os"

    src = spark.createDataFrame(src_rows, "doc_id string, mtime long")
    md = spark.createDataFrame(md_rows, "doc_id string, mtime long, sync_key string")
    dest = spark.createDataFrame(
        dest_rows, "doc_id string, parent_id string, doc_mtime long"
    )
    plan = store_sync(src, dest, md)
    got_docs = {
        r.sync_id: r.status for r in plan.filter(F.col("kind") == "doc").collect()
    }
    got_del = {
        r.sync_id: r.status
        for r in plan.filter(F.col("kind") == "piece").collect()
    }
    assert got_docs == expect_docs
    assert got_del == expect_del


def test_assign_piece_ids_and_load_keys_roundtrip(spark):
    """Produce -> list -> reconcile closes the loop: content-hash piece ids
    + load_keys md records make store_sync report correctly_loaded for
    unchanged docs; changing one piece's PAYLOAD (or position) mints a new
    splitdoc id and flips its parent to mismatch_key."""
    from sycamore_spark.operators.storesync import (
        assign_piece_ids,
        load_keys,
        store_sync,
    )

    pieces = spark.createDataFrame(
        [
            ("d1", 0, ""), ("d1", 1, "alpha"), ("d1", 2, "beta"),
            ("d2", 0, ""), ("d2", 1, "alpha"),  # same payload as d1/1: distinct id (parent in hash)
            ("d3", 0, ""), ("d3", 1, "x"), ("d3", 2, "x"),  # dup payload, distinct pos -> distinct ids
        ],
        "parent_id string, pos long, payload string",
    )
    assigned = assign_piece_ids(pieces)
    ids = {(r.parent_id, r.pos): r.doc_id for r in assigned.collect()}
    assert ids[("d1", 0)] == "d1"
    assert ids[("d1", 1)].startswith("splitdoc-")
    assert ids[("d1", 1)] != ids[("d2", 1)]  # parent in the hash
    assert ids[("d3", 1)] != ids[("d3", 2)]  # position in the hash
    assert len(set(ids.values())) == len(ids)

    with_mt = assigned.withColumn("mtime", F.lit(10).cast("long"))
    md = load_keys(with_mt)
    src = spark.createDataFrame(
        [("d1", 10), ("d2", 10), ("d3", 10)], "doc_id string, mtime long"
    )
    dest = assigned.select(
        "doc_id",
        F.when(F.col("pos") > 0, F.col("parent_id")).alias("parent_id"),
        F.when(F.col("pos") == 0, F.lit(10).cast("long")).alias("doc_mtime"),
    )
    plan = store_sync(src, dest, md)
    docs = {r.sync_id: r.status for r in plan.filter(F.col("kind") == "doc").collect()}
    assert docs == {"d1": "correctly_loaded", "d2": "correctly_loaded",
                    "d3": "correctly_loaded"}

    # now d1's piece 1 content changed since the load: re-split today
    changed = pieces.withColumn(
        "payload",
        F.when((F.col("parent_id") == "d1") & (F.col("pos") == 1),
               F.lit("alpha-EDITED")).otherwise(F.col("payload")),
    )
    dest2 = assign_piece_ids(changed).select(
        "doc_id",
        F.when(F.col("pos") > 0, F.col("parent_id")).alias("parent_id"),
        F.when(F.col("pos") == 0, F.lit(10).cast("long")).alias("doc_mtime"),
    )
    plan2 = store_sync(src, dest2, md)
    docs2 = {r.sync_id: r.status for r in plan2.filter(F.col("kind") == "doc").collect()}
    assert docs2 == {"d1": "mismatch_key", "d2": "correctly_loaded",
                     "d3": "correctly_loaded"}
    purged = {r.sync_id for r in plan2.filter(F.col("kind") == "piece").collect()}
    assert "d1" in purged and len(purged) == 3  # d1's current 3 pieces
