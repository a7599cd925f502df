"""CLI smoke (subprocess: the CLI owns its own Ray session)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_cli_run_export_eval(corpus_dir, tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo")
    run_dir = str(tmp_path / "clirun")
    out_dir = str(tmp_path / "cliout")

    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli", "--num-cpus", "4",
         "run", "--input", f"{corpus_dir}/docs", "--run-dir", run_dir,
         "--substring"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["n_docs"] == 1054 and metrics["n_clusters"] > 0

    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli", "--num-cpus", "4",
         "export", "--run-dir", run_dir, "--output-dir", out_dir],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(f.endswith(".parquet") for f in os.listdir(out_dir))

    corpus_out = str(tmp_path / "clicorpus")
    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli", "--num-cpus", "4",
         "export", "--run-dir", run_dir, "--output-dir", corpus_out,
         "--corpus", "--partition-by", "lang"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    mc = json.loads(r.stdout.strip().splitlines()[-1])
    assert mc["n_kept"] + mc["n_dropped"] == metrics["n_docs"]
    assert mc["n_kept"] == metrics["n_clusters"]
    assert any(d.startswith("lang=") for d in os.listdir(corpus_out))

    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli", "--num-cpus", "4",
         "eval", "--run-dir", run_dir,
         "--golden-pairs", f"{corpus_dir}/golden_pairs.parquet"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["recall"] >= 0.99 and m["precision"] >= 0.99


def test_cli_query_subcommand(tmp_path):
    """`cli query <name> --sf-dir ...` runs a battery entry in a
    subprocess: JSONL rows to stdout, Parquet with --output, exit 2
    with the known-names list for an unknown query."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "2", "query"]
    r = subprocess.run(
        base + ["q03_distinct_event_types",
                "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, env=env, timeout=240)
    assert r.returncode == 0, r.stderr[-500:]
    rows = [json.loads(l) for l in r.stdout.strip().splitlines()
            if l.startswith("{")]
    assert {row["event_type"] for row in rows} == {
        "view", "click", "purchase", "signup", "error"}

    out = str(tmp_path / "q3.parquet")
    r2 = subprocess.run(
        base + ["q03_distinct_event_types",
                "--sf-dir", "/root/testdata/sf0.001", "--output", out],
        capture_output=True, text=True, env=env, timeout=240)
    assert r2.returncode == 0, r2.stderr[-500:]
    assert pq.read_table(out).num_rows == 5

    r3 = subprocess.run(
        base + ["no_such_query", "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, env=env, timeout=240)
    assert r3.returncode == 2
    assert "unknown query" in r3.stderr


def test_cli_index_subcommand(tmp_path):
    """`cli index build/add/search` lifecycle in subprocesses: build
    on one file, add a second, and an AND search spanning both halves
    answers over the union; missing --terms exits 2."""
    import json
    import subprocess
    import sys

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["alpha beta", "alpha gamma"]})), a)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [3], "text": ["alpha beta delta"]})), b)
    idx = str(tmp_path / "idx")
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "2", "index"]

    for action, inp in (("build", a), ("add", b)):
        r = subprocess.run(base + [action, "--index-dir", idx,
                                   "--input", inp],
                           capture_output=True, text=True, env=env,
                           timeout=240)
        assert r.returncode == 0, r.stderr[-500:]

    r = subprocess.run(base + ["search", "--index-dir", idx,
                               "--terms", "alpha,beta"],
                       capture_output=True, text=True, env=env,
                       timeout=240)
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["doc_ids"] == [1, 3] and out["n_hits"] == 2

    r2 = subprocess.run(base + ["search", "--index-dir", idx],
                        capture_output=True, text=True, env=env,
                        timeout=240)
    assert r2.returncode == 2


def test_cli_review_and_config_subcommands(corpus_dir, tmp_path):
    """Review + config surfaces end-to-end in subprocesses: run a
    tiny pipeline, patch the config (deep-merge, persisted), split a
    doc (audit row durably appended), then apply replays the audit
    into an edited assignment table where the split doc sits in its
    own forced cluster."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    run_dir = str(tmp_path / "rvrun")
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "4"]

    r = subprocess.run(
        base + ["run", "--input", f"{corpus_dir}/docs",
                "--run-dir", run_dir],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(base + ["config", "get", "--run-dir", run_dir],
                       env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    cfg = json.loads(r.stdout.strip().splitlines()[-1])
    assert "shingle_k" in cfg

    r = subprocess.run(
        base + ["config", "patch", "--run-dir", run_dir,
                "--set", "min_text_chars=7"],
        env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout.strip().splitlines()[-1])[
        "min_text_chars"] == 7

    import pyarrow.parquet as pq
    import pyarrow.dataset as pds
    asn = pds.dataset(f"{run_dir}/assignments").to_table().to_pandas()
    victim = int(asn["doc_id"].iloc[0])

    r = subprocess.run(
        base + ["review", "split", "--run-dir", run_dir,
                "--doc-id", str(victim)],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_edits"] == 1

    edited_dir = str(tmp_path / "edited")
    r = subprocess.run(
        base + ["review", "apply", "--run-dir", run_dir,
                "--output-dir", edited_dir],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    edited = pds.dataset(edited_dir).to_table().to_pandas()
    assert len(edited) == len(asn)
    assert int(edited.set_index("doc_id").loc[victim, "cluster_id"]) \
        == victim


def test_cli_add_subcommand(corpus_dir, tmp_path):
    """Incremental ingest from the shell: run the pipeline, then add
    a second small batch of fresh docs; the combined assignment count
    is the union and the reported cluster count grows by the new
    singletons."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    run_dir = str(tmp_path / "addrun")
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "4"]

    r = subprocess.run(
        base + ["run", "--input", f"{corpus_dir}/docs",
                "--run-dir", run_dir, "--substring"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    m0 = json.loads(r.stdout.strip().splitlines()[-1])

    newdocs = str(tmp_path / "new.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "url": [f"https://new.example/{i}" for i in range(4)],
        "warc_ts": pd.Series(
            pd.to_datetime(["2026-01-01"] * 4)).astype("datetime64[us]"),
        "text": [f"entirely fresh document number {i} with plenty of "
                 f"unique tokens to stand alone in the corpus {i}"
                 for i in range(4)],
        "lang": ["en"] * 4,
    }), preserve_index=False), newdocs)

    r2 = subprocess.run(
        base + ["add", "--run-dir", run_dir, "--input", newdocs,
                "--persist"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m1 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m1["n_docs"] == m0["n_docs"] + 4
    assert m1["n_clusters"] == m0["n_clusters"] + 4
    assert m1["persisted"] is True

    # --persist folded the batch back: a SECOND add chains on it
    # (without it, the run dir still held only the original corpus)
    newdocs2 = str(tmp_path / "new2.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "url": [f"https://new2.example/{i}" for i in range(3)],
        "warc_ts": pd.Series(
            pd.to_datetime(["2026-01-02"] * 3)).astype("datetime64[us]"),
        "text": [f"second wave document {i} again fully distinct "
                 f"from everything else in the growing corpus {i}"
                 for i in range(3)],
        "lang": ["en"] * 3,
    }), preserve_index=False), newdocs2)
    r3 = subprocess.run(
        base + ["add", "--run-dir", run_dir, "--input", newdocs2],
        env=env, capture_output=True, text=True, timeout=600)
    assert r3.returncode == 0, r3.stderr[-2000:]
    m2 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert m2["n_docs"] == m1["n_docs"] + 3
    assert m2["n_clusters"] == m1["n_clusters"] + 3


@pytest.mark.slow
def test_cli_compare_subcommand(tmp_path):
    """`cli compare --run-dir-a ... --run-dir-b ...` reports drift:
    a run compared against itself is ARI 1.0 with zero churn; against
    a stricter-threshold rerun the ARI drops below 1 only if clusters
    actually moved (and n_common always equals the corpus)."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    docs = "/root/testdata/sf0.001/documents.parquet"
    ra, rb = str(tmp_path / "runA"), str(tmp_path / "runB")
    for rd_, extra in ((ra, []), (rb, ["--substring"])):
        r = subprocess.run(
            [sys.executable, "-m", "event_deduplication_ray.cli",
             "--num-cpus", "4", "run", "--input", docs,
             "--run-dir", rd_] + extra,
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli",
         "--num-cpus", "4", "compare",
         "--run-dir-a", ra, "--run-dir-b", ra],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["ari"] == 1.0 and m["n_moved"] == 0 and m["n_common"] == 500

    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli",
         "--num-cpus", "4", "compare",
         "--run-dir-a", ra, "--run-dir-b", rb],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["n_common"] == 500
    assert 0.0 <= m["ari"] <= 1.0


def test_cli_remove_and_update_subcommands(tmp_path):
    """Watcher surface from the shell: run a tiny corpus, delete two
    docs (remove --persist), then present a new snapshot (one doc
    changed, one added) through update — counts track the deltas and
    the run dir chains through all three states."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    run_dir = str(tmp_path / "updrun")
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "4"]

    def docs_frame(n=10):
        return pd.DataFrame({
            "url": [f"https://corp.example/{i}" for i in range(n)],
            "warc_ts": pd.Series(
                pd.to_datetime(["2026-02-01"] * n)).astype("datetime64[us]"),
            "text": [f"standalone corpus document number {i} holding a "
                     f"healthy pile of distinct filler tokens {i}"
                     for i in range(n)],
            "lang": ["en"] * n,
        })

    corpus = str(tmp_path / "corpus.parquet")
    df = docs_frame()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), corpus)

    r = subprocess.run(
        base + ["run", "--input", corpus, "--run-dir", run_dir],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    m0 = json.loads(r.stdout.strip().splitlines()[-1])
    assert m0["n_docs"] == 10

    # pick two victims by url via the extracted checkpoint
    ex = pd.read_parquet(f"{run_dir}/extracted")
    victims = ex[ex["url"].isin(
        ["https://corp.example/0", "https://corp.example/1"])]
    ids = ",".join(str(i) for i in victims["doc_id"].tolist())
    r2 = subprocess.run(
        base + ["remove", "--run-dir", run_dir, "--doc-ids", ids,
                "--persist"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m1 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m1["n_removed"] == 2 and m1["n_docs"] == 8
    assert m1["persisted"] is True

    # snapshot: the 8 survivors, doc 2's text changed, doc 10 added
    snap = df[~df["url"].isin(
        ["https://corp.example/0", "https://corp.example/1"])].copy()
    snap.loc[snap["url"] == "https://corp.example/2", "text"] += " edited"
    snap = pd.concat([snap, docs_frame(11).iloc[[10]]], ignore_index=True)
    snap_path = str(tmp_path / "snapshot.parquet")
    pq.write_table(pa.Table.from_pandas(snap, preserve_index=False),
                   snap_path)

    r3 = subprocess.run(
        base + ["update", "--run-dir", run_dir, "--input", snap_path],
        env=env, capture_output=True, text=True, timeout=600)
    assert r3.returncode == 0, r3.stderr[-2000:]
    m2 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert m2["added"] == 1 and m2["changed"] == 1 and m2["removed"] == 0
    assert m2["n_docs"] == 9


@pytest.mark.slow
def test_cli_compact_subcommand(corpus_dir, tmp_path):
    """`cli compact --run-dir` in a subprocess: run → fragment a stage
    → compact → rerun resumes on the compacted dir with identical
    metrics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    run_dir = str(tmp_path / "run")
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "4"]

    r = subprocess.run(
        base + ["run", "--input", f"{corpus_dir}/docs",
                "--run-dir", run_dir],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    m1 = json.loads(r.stdout.strip().splitlines()[-1])

    # fragment assignments into many tiny files
    d = os.path.join(run_dir, "assignments")
    t = pq.read_table(d)
    for f in os.listdir(d):
        os.remove(os.path.join(d, f))
    step = -(-len(t) // 8)
    for i in range(8):
        pq.write_table(t.slice(i * step, step),
                       os.path.join(d, f"frag-{i}.parquet"))

    r = subprocess.run(
        base + ["compact", "--run-dir", run_dir],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["assignments"]["files_before"] == 8
    assert out["assignments"]["files_after"] == 1

    r = subprocess.run(
        base + ["run", "--input", f"{corpus_dir}/docs",
                "--run-dir", run_dir],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    m2 = json.loads(r.stdout.strip().splitlines()[-1])
    assert m2 == m1


def test_cli_index_phrase_mode(tmp_path):
    """`cli index build --phrase` + `search --phrase`: ordered-phrase
    semantics from the shell (overlaps counted at the library level;
    the CLI reports matching doc ids)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["a b a b a", "b a x a b", "c c"]})
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(src / "d.parquet"))
    idx = str(tmp_path / "pidx")
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "4", "index"]

    r = subprocess.run(base + ["build", "--index-dir", idx,
                               "--input", str(src), "--phrase"],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(base + ["search", "--index-dir", idx,
                               "--terms", "a,b,a", "--phrase"],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["mode"] == "phrase" and out["doc_ids"] == [1]


def test_cli_fsck_subcommand(corpus_dir, tmp_path):
    """`cli fsck --run-dir`: exit 0 + ok on a clean run; exit 1 after
    a stage is corrupted."""
    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    run_dir = str(tmp_path / "run")
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "4"]
    r = subprocess.run(
        base + ["run", "--input", f"{corpus_dir}/docs",
                "--run-dir", run_dir],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(base + ["fsck", "--run-dir", run_dir],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["ok"]

    d = os.path.join(run_dir, "assignments")
    t = pq.read_table(d)
    for f in os.listdir(d):
        os.remove(os.path.join(d, f))
    pq.write_table(t.slice(0, len(t) - 3),
                   os.path.join(d, "part-trunc.parquet"))
    r = subprocess.run(base + ["fsck", "--run-dir", run_dir],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 1
    assert not json.loads(r.stdout.strip().splitlines()[-1])["ok"]


def test_cli_report_subcommand():
    """`cli report --sf-dir`: the composed corpus health JSON carries
    every section with consistent totals."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "event_deduplication_ray.cli",
         "--num-cpus", "4", "report", "--sf-dir",
         "/root/testdata/sf0.001"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n_docs"] == 500
    assert sum(rep["langs"].values()) == rep["n_docs"]
    assert rep["dup_docs"] >= 2 * rep["dup_clusters_multi"]
    assert set(rep["effective_tokens"]) == {
        "total_tokens", "kept_tokens", "dup_token_ppm"}
    assert rep["effective_tokens"]["kept_tokens"] <= \
        rep["effective_tokens"]["total_tokens"]
    assert all(0 <= v <= 1_000_000 for v in rep["source_dup_ppm"].values())


def test_cli_screen_subcommand(tmp_path):
    """Read-only admission control from the shell: run a tiny corpus,
    screen a batch with one corpus dup, one within-batch twin pair and
    one novel doc → 2 dup / 2 novel, verdict Parquet written, run dir
    untouched."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    base = [sys.executable, "-m", "event_deduplication_ray.cli",
            "--num-cpus", "4"]
    run_dir = str(tmp_path / "screenrun")

    def docs_tbl(rows):
        return pa.Table.from_pandas(pd.DataFrame({
            "url": [u for u, _ in rows],
            "warc_ts": pd.Series(pd.to_datetime(
                ["2026-01-01"] * len(rows))).astype("datetime64[us]"),
            "text": [t for _, t in rows],
            "lang": ["en"] * len(rows),
        }), preserve_index=False)

    corpus = str(tmp_path / "corpus.parquet")
    base_text = ("the quick brown fox jumps over the lazy dog near "
                 "the old river bank today")
    pq.write_table(docs_tbl([
        ("https://c.example/1", base_text),
        ("https://c.example/2", "pottery glazes and kiln temperature "
                                "control methods for stoneware firing"),
        ("https://c.example/3", "alpine weather patterns and seasonal "
                                "snowfall accumulation measurements"),
    ]), corpus)
    batch = str(tmp_path / "batch.parquet")
    twin = ("twin text shared by exactly two batch documents for "
            "the keep first admission check")
    pq.write_table(docs_tbl([
        ("https://b.example/dup", base_text),
        ("https://b.example/new", "entirely novel content on deep sea "
                                  "vents and chemosynthetic ecosystems"),
        ("https://b.example/twin1", twin),
        ("https://b.example/twin2", twin),
    ]), batch)

    r = subprocess.run(
        base + ["run", "--input", corpus, "--run-dir", run_dir,
                "--substring"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    verdicts = str(tmp_path / "verdicts.parquet")
    r2 = subprocess.run(
        base + ["screen", "--run-dir", run_dir, "--input", batch,
                "--output", verdicts],
        env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m["n_docs"] == 4 and m["n_dup"] == 2 and m["n_novel"] == 2
    v = pq.read_table(verdicts).to_pandas()
    assert set(v.columns) == {"doc_id", "is_dup", "dup_of", "score", "tier"}
    assert int(v["is_dup"].sum()) == 2
