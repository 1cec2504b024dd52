"""AutoMaterialize (materialize.py; reference materialize.py:623):
LLM stages checkpoint under enable(); reruns reuse the stored parquet."""

import os

import pytest

from sycamore_spark import materialize
from sycamore_spark.llm.client import LLM
from sycamore_spark.llm.map import llm_map


@pytest.fixture(autouse=True)
def _clean_state():
    yield
    materialize.disable()


def _counting_factory(counter_dir):
    """LLM whose every generate_batch call drops a marker file — observable
    across executor processes."""

    class CountingLLM(LLM):
        def generate_batch(self, prompts):
            import uuid

            with open(os.path.join(counter_dir, f"call-{uuid.uuid4().hex}"), "w") as f:
                f.write(str(len(prompts)))
            return [p.upper()[-20:] for p in prompts]

    return CountingLLM


def _calls(counter_dir):
    return len([f for f in os.listdir(counter_dir) if f.startswith("call-")])


def test_auto_materialize_reuses_checkpoint(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    counter = str(tmp_path / "calls")
    os.makedirs(counter)
    df = spark.createDataFrame([("d1", "alpha"), ("d2", "beta")], "doc_id string, text string")
    factory = _counting_factory(counter)

    materialize.enable(ckpt)
    out1 = llm_map(df, "Say {{ text }}", "resp", factory).collect()
    calls_first = _calls(counter)
    assert calls_first >= 1
    assert sorted(r["resp"] for r in out1) == ["SAY ALPHA", "SAY BETA"]

    # same stage key (prompt/output/schema) -> stored parquet, zero LLM calls
    out2 = llm_map(df, "Say {{ text }}", "resp", factory).collect()
    assert _calls(counter) == calls_first
    assert sorted(r["resp"] for r in out2) == sorted(r["resp"] for r in out1)

    # a different prompt is a different stage -> recomputes
    llm_map(df, "Shout {{ text }}", "resp", factory).collect()
    assert _calls(counter) > calls_first


def test_auto_materialize_kill_and_resume(spark, tmp_path):
    """Simulated driver crash: a fresh 'session' (new enable()) resolves the
    identical stage to the same directory and resumes from the checkpoint."""
    ckpt = str(tmp_path / "ckpt")
    counter = str(tmp_path / "calls")
    os.makedirs(counter)
    df = spark.createDataFrame([("d1", "alpha")], "doc_id string, text string")
    factory = _counting_factory(counter)

    materialize.enable(ckpt)
    llm_map(df, "Say {{ text }}", "resp", factory).collect()
    first = _calls(counter)
    materialize.disable()  # "crash"

    materialize.enable(ckpt)  # "restart"
    out = llm_map(df, "Say {{ text }}", "resp", factory).collect()
    assert _calls(counter) == first  # resumed, no LLM re-invocation
    assert out[0]["resp"] == "SAY ALPHA"


def test_incomplete_checkpoint_recomputes(spark, tmp_path):
    """No _SUCCESS marker -> the checkpoint is incomplete and must not be
    trusted (the reference's completeness-marker contract)."""
    ckpt = str(tmp_path / "ckpt")
    counter = str(tmp_path / "calls")
    os.makedirs(counter)
    df = spark.createDataFrame([("d1", "alpha")], "doc_id string, text string")
    factory = _counting_factory(counter)

    materialize.enable(ckpt)
    llm_map(df, "Say {{ text }}", "resp", factory).collect()
    first = _calls(counter)

    # corrupt: remove the completeness marker
    stage_dirs = [d for d in os.listdir(ckpt) if d.startswith("llm_map-")]
    assert len(stage_dirs) == 1
    os.remove(os.path.join(ckpt, stage_dirs[0], "_SUCCESS"))

    llm_map(df, "Say {{ text }}", "resp", factory).collect()
    assert _calls(counter) > first


def test_disabled_means_no_checkpoints(spark, tmp_path):
    counter = str(tmp_path / "calls")
    os.makedirs(counter)
    df = spark.createDataFrame([("d1", "alpha")], "doc_id string, text string")
    llm_map(df, "Say {{ text }}", "resp", _counting_factory(counter)).collect()
    assert not os.path.exists(str(tmp_path / "ckpt"))


# ---------------------------------------------------------------------------
# reliable_materialize (reference materialize.py:47 MaterializeReadReliability)
# ---------------------------------------------------------------------------


def test_reliable_materialize_retries_then_succeeds(spark, tmp_path):
    """A transform that fails once mid-run: the loop retries the failed
    batch, already-written batches are not recomputed, and the final
    re-read equals the direct transform output."""
    out_root = str(tmp_path / "out")
    flag = str(tmp_path / "failed-once")
    calls_dir = tmp_path / "calls"
    calls_dir.mkdir()

    df = spark.range(100).selectExpr("id AS doc_id", "id * 2 AS v")

    def flaky(sub):
        n = len(list(calls_dir.iterdir()))
        (calls_dir / f"call-{n}").touch()
        if n == 2 and not os.path.exists(flag):  # fail the 3rd batch, once
            open(flag, "w").close()
            raise RuntimeError("transient failure")
        return sub.withColumn("v", sub.v + 1)

    out = materialize.reliable_materialize(
        df, out_root, transform=flaky, id_col="doc_id", max_batch=25, max_retries=3
    )
    got = sorted((r.doc_id, r.v) for r in out.collect())
    assert got == [(i, 2 * i + 1) for i in range(100)]
    assert os.path.exists(flag)  # the failure really happened
    # 4 batches + 1 retry = 5 transform invocations
    assert len(list(calls_dir.iterdir())) == 5


def test_reliable_materialize_resumes_from_partial_dir(spark, tmp_path):
    """Kill-and-resume: after a first full run, removing one batch's
    _SUCCESS marker (a simulated half-written batch) makes a second run
    rewrite ONLY that batch."""
    out_root = str(tmp_path / "out")
    df = spark.range(60).selectExpr("id AS doc_id")
    materialize.reliable_materialize(df, out_root, id_col="doc_id", max_batch=20)
    batches = sorted(d for d in os.listdir(out_root) if d.startswith("batch-"))
    assert len(batches) == 3
    os.remove(os.path.join(out_root, batches[1], "_SUCCESS"))

    calls = []

    def tracking(sub):
        calls.append(1)
        return sub

    out = materialize.reliable_materialize(
        df, out_root, transform=tracking, id_col="doc_id", max_batch=20
    )
    assert len(calls) == 1  # only the damaged batch recomputed
    assert sorted(r.doc_id for r in out.collect()) == list(range(60))


def test_reliable_materialize_gives_up_after_max_retries(spark, tmp_path):
    df = spark.range(10).selectExpr("id AS doc_id")

    def always_fails(sub):
        raise RuntimeError("permanent failure")

    with pytest.raises(RuntimeError, match="permanent failure"):
        materialize.reliable_materialize(
            df, str(tmp_path / "out"), transform=always_fails,
            id_col="doc_id", max_batch=5, max_retries=2,
        )


def test_reliable_materialize_refuses_changed_input(spark, tmp_path):
    """Resuming against a different input must refuse, not silently union
    stale batches: n_batches/row-count metadata is persisted under out_root
    on the first run and validated on resume."""
    out_root = str(tmp_path / "out")
    df = spark.range(60).selectExpr("id AS doc_id")
    materialize.reliable_materialize(df, out_root, id_col="doc_id", max_batch=20)
    assert os.path.exists(os.path.join(out_root, "_RELIABLE_META.json"))

    grown = spark.range(61).selectExpr("id AS doc_id")
    with pytest.raises(ValueError, match="different\\s+input"):
        materialize.reliable_materialize(grown, out_root, id_col="doc_id", max_batch=20)


def test_reliable_materialize_resume_uses_stored_n_batches(spark, tmp_path):
    """Same input, different max_batch on resume: the stored bucketing wins,
    so completed batches stay valid and nothing is recomputed."""
    out_root = str(tmp_path / "out")
    df = spark.range(60).selectExpr("id AS doc_id")
    materialize.reliable_materialize(df, out_root, id_col="doc_id", max_batch=20)

    calls = []

    def tracking(sub):
        calls.append(1)
        return sub

    out = materialize.reliable_materialize(
        df, out_root, transform=tracking, id_col="doc_id", max_batch=7
    )
    assert calls == []  # all three stored batches recognized as complete
    assert sorted(r.doc_id for r in out.collect()) == list(range(60))


def test_clear_materialize_roundtrip(spark, tmp_path):
    from sycamore_spark.docset import DocSet

    path = str(tmp_path / "ckpt")
    ds = DocSet(spark.range(5).toDF("doc_id"))
    ds.materialize(path, source_mode="USE_STORED")
    assert (tmp_path / "ckpt" / "_SUCCESS").exists()
    ds.clear_materialize(path)
    assert not (tmp_path / "ckpt").exists()
    # idempotent on missing path
    ds.clear_materialize(path)


def test_suggest_schema_returns_value(spark):
    from sycamore_spark.docset import DocSet
    from sycamore_spark.llm.client import MockLLM

    df = spark.createDataFrame(
        [(1, '{"title": "a", "pages": 3}'), (2, '{"title": "b", "pages": 9}')],
        "doc_id int, text_representation string",
    )
    row = DocSet(df).suggest_schema(lambda: MockLLM())
    assert row is not None


def test_reliable_materialize_uri_paths_resume(spark, tmp_path):
    """Pin the Hadoop-FS contract: out_root as a file:// URI (the shape an
    hdfs:// / s3a:// path takes) must materialize, persist meta, and resume.
    os.path.exists() returns False for URI strings, so this test fails if
    the resume protocol ever reverts to driver-local os.path checks."""
    import os

    df = spark.range(0, 60).selectExpr("cast(id as string) as doc_id", "id as v")
    out_root = f"file://{tmp_path}/reliable-uri"
    got = materialize.reliable_materialize(df, out_root, id_col="doc_id", max_batch=20)
    assert got.count() == 60
    # meta + batch markers live where the URI points (local disk here)
    local_root = f"{tmp_path}/reliable-uri"
    assert os.path.exists(os.path.join(local_root, "_RELIABLE_META.json"))
    assert not os.path.exists(out_root)  # the URI itself is not an os path

    # delete one batch's _SUCCESS: resume must rewrite ONLY that batch
    batches = sorted(p for p in os.listdir(local_root) if p.startswith("batch-"))
    victim = os.path.join(local_root, batches[0], "_SUCCESS")
    os.remove(victim)
    got2 = materialize.reliable_materialize(df, out_root, id_col="doc_id", max_batch=20)
    assert got2.count() == 60
    assert os.path.exists(victim)  # rewritten through the Hadoop FS path

    # changed input must still be refused through the URI meta read
    import pytest

    with pytest.raises(ValueError, match="different"):
        materialize.reliable_materialize(
            df.limit(10), out_root, id_col="doc_id", max_batch=20
        )
