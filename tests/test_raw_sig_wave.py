"""Equivalence of the raw-task signature wave vs the Ray Data path.

``dedup_path`` bypasses the streaming executor for well-sharded
parquet dirs (>=64 files) with one raw ``ray.remote`` task per file
doing read → extract → signature (stages/signatures.py
``signatures_from_files``).  The bypass must be output-IDENTICAL to
read_parquet → extract_stage → signature_stage — per-doc outputs
cannot depend on batch/block boundaries.
"""

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sharded_docs(tmp_path_factory, corpus_dir, ray_session) -> str:
    """The 1k fixture corpus re-sharded into 70 small files so the
    >=64-file eligibility gate triggers."""
    root = tmp_path_factory.mktemp("sharded")
    docs = str(root / "docs")
    os.makedirs(docs)
    src = pq.read_table(f"{corpus_dir}/docs")
    per = (src.num_rows + 69) // 70
    for i in range(70):
        pq.write_table(src.slice(i * per, per),
                       f"{docs}/part{i:03d}.parquet")
    return docs


def _run(docs: str, enabled: bool):
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import (
        _raw_sig_wave_files,
        dedup_path,
    )

    cfg = DedupConfig(use_substring=True, use_simhash=True)
    old = os.environ.get("EDR_RAW_SIG_WAVE")
    os.environ["EDR_RAW_SIG_WAVE"] = "1" if enabled else "0"
    try:
        if enabled:
            assert _raw_sig_wave_files(docs, cfg) is not None
        res = dedup_path(docs, cfg)
        asn = res.assignments.to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # edge tier order within one (id_a, id_b) follows union block
        # order — sort on all columns for the comparison
        edges = res.edges.to_pandas() \
            .sort_values(["id_a", "id_b", "tier", "score"]) \
            .reset_index(drop=True)
        return asn, edges
    finally:
        if old is None:
            os.environ.pop("EDR_RAW_SIG_WAVE", None)
        else:
            os.environ["EDR_RAW_SIG_WAVE"] = old


def test_raw_wave_output_identical(sharded_docs, ray_session):
    a0, e0 = _run(sharded_docs, enabled=False)
    a1, e1 = _run(sharded_docs, enabled=True)
    assert len(a0) > 0 and len(e0) > 0
    assert a0.equals(a1)
    assert e0.equals(e1)


def test_raw_wave_eligibility_gates(tmp_path, corpus_dir, ray_session):
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import (
        _raw_sig_wave_files,
    )

    cfg = DedupConfig()
    # the fixture corpus dir has < 64 files → ineligible
    assert _raw_sig_wave_files(f"{corpus_dir}/docs", cfg) is None
    # canonicalize_urls needs the keep-first shuffle → ineligible
    many = tmp_path / "many"
    many.mkdir()
    src = pq.read_table(f"{corpus_dir}/docs")
    for i in range(64):
        pq.write_table(src.slice(i, 1), str(many / f"p{i:02d}.parquet"))
    assert _raw_sig_wave_files(str(many), cfg) is not None
    assert _raw_sig_wave_files(
        str(many), DedupConfig(canonicalize_urls=True)) is None
    # a stray non-parquet sidecar flips the dir ineligible
    (many / "manifest.json").write_text("{}")
    assert _raw_sig_wave_files(str(many), cfg) is None


def test_raw_wave_handles_rejected_and_empty_files(tmp_path, ray_session):
    """A file whose rows are ALL rejected (empty html+text) must yield
    a typed empty block, not crash the wave."""
    import pyarrow as pa

    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.stages.signatures import (
        signatures_from_files,
    )

    docs = tmp_path / "docs"
    docs.mkdir()
    bad = pa.table({
        "url": pa.array(["https://x.com/a", "https://x.com/b"]),
        "warc_ts": pa.array([None, None], pa.timestamp("us")),
        "html": pa.array([b"", b""], pa.binary()),
        "text": pa.array([None, None], pa.string()),
        "lang": pa.array(["en", "en"]),
    })
    ok = pa.table({
        "url": pa.array(["https://x.com/c"]),
        "warc_ts": pa.array([None], pa.timestamp("us")),
        "html": pa.array([b"<html><body>some real text here for doc c"
                          b" with enough words</body></html>"], pa.binary()),
        "text": pa.array([None], pa.string()),
        "lang": pa.array(["en"]),
    })
    pq.write_table(bad, str(docs / "p0.parquet"))
    pq.write_table(ok, str(docs / "p1.parquet"))
    ds = signatures_from_files(
        [str(docs / "p0.parquet"), str(docs / "p1.parquet")],
        DedupConfig(), passthrough=("url", "warc_ts", "lang", "text_len"))
    df = ds.to_pandas()
    assert len(df) == 1
    assert set(["doc_id", "url", "warc_ts", "lang", "text_len"]) \
        <= set(df.columns)


def test_extracted_checkpoint_wave_identical(tmp_path, corpus_dir, ray_session):
    """signatures_from_extracted_files over a sharded extracted
    checkpoint must equal signature_stage over the same data —
    including the narrow column-pruned read."""
    import pyarrow as pa
    import ray.data as rd

    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.stages.extract import extract_stage
    from event_deduplication_ray.stages.signatures import (
        signature_stage,
        signatures_from_extracted_files,
    )

    cfg = DedupConfig()
    ex = extract_stage(rd.read_parquet(f"{corpus_dir}/docs"), cfg) \
        .materialize()
    # shard the checkpoint into 70 files
    src = pa.concat_tables(
        [ray_get_table(b) for b in ex.to_arrow_refs()])
    ckpt = tmp_path / "extracted"
    ckpt.mkdir()
    per = (src.num_rows + 69) // 70
    for i in range(70):
        pq.write_table(src.slice(i * per, per),
                       str(ckpt / f"part{i:03d}.parquet"))

    want = signature_stage(
        rd.read_parquet(str(ckpt)), cfg,
        passthrough=("url", "warc_ts", "lang", "text_len"),
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = signatures_from_extracted_files(
        sorted(str(p) for p in ckpt.glob("*.parquet")), cfg,
        passthrough=("url", "warc_ts", "lang", "text_len"),
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    import numpy as np

    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype == object:
            assert all(
                np.array_equal(x, y) if isinstance(x, np.ndarray) else x == y
                for x, y in zip(a, b)), c
        else:
            assert np.array_equal(a, b), c


def ray_get_table(ref):
    import ray

    return ray.get(ref)


def test_parallel_shard_writer_byte_identical(tmp_path):
    """The fork-pool strided shard writer (big-corpus fixtures path)
    must produce byte-identical files to the serial writer loop."""
    import hashlib
    import multiprocessing as mp

    import numpy as np
    import pyarrow as pa

    import event_deduplication_ray.fixtures as F

    docs, _, _ = F.generate_corpus(3000, seed=7)
    n, n_files = docs.num_rows, 8
    ser, par = tmp_path / "ser", tmp_path / "par"
    for d in (ser, par):
        (d / "docs").mkdir(parents=True)
    writers = [pq.ParquetWriter(str(ser / "docs" / f"part-{i:04d}.parquet"),
                                docs.schema) for i in range(n_files)]
    for i in range(n_files):
        idx = np.arange(i, n, n_files)
        writers[i].write_table(docs.take(pa.array(idx)), row_group_size=2000)
    for w in writers:
        w.close()
    F._WRITE_DOCS = docs
    try:
        with mp.get_context("fork").Pool(4) as pool:
            pool.map(F._write_strided_shard,
                     [(str(par), i, n_files, n) for i in range(n_files)],
                     chunksize=1)
    finally:
        F._WRITE_DOCS = None
    for i in range(n_files):
        a = (ser / "docs" / f"part-{i:04d}.parquet").read_bytes()
        b = (par / "docs" / f"part-{i:04d}.parquet").read_bytes()
        assert hashlib.sha256(a).digest() == hashlib.sha256(b).digest(), i
