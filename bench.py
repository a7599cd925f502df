"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)
and print ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

--scaling: run the flagship pipeline twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same (pre-generated, page-warm)
input and print both throughputs + scaling efficiency — the sandbox
stand-in for the north rule's N-vs-4N-node criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_ROOT = "/tmp/edr_bench_corpora"

# Shuffle-task width: 1 cpu per task (full task parallelism).  An
# earlier round set 2-cpu tasks on wide nodes to cap concurrent
# page-faulters during a fault-contended host window; re-measured in a
# quiet window (round 3), tc=2 just halves parallelism (34.2 s vs
# 23.0 s at 32 cpus, P=32, 500 k docs).  EDR_TASK_CPUS stays as an
# operator knob for genuinely fault-contended hosts.
if "EDR_TASK_CPUS" not in os.environ:
    os.environ["EDR_TASK_CPUS"] = "1"


def corpus_docs_for(sf_dir: str) -> int:
    # GRAFT_BENCH_DOCS overrides the corpus size (e.g. the 1M-doc
    # scaling-vs-input-size evidence in BASELINE.md); default derives
    # from the sf tier, capped at 500k.
    override = os.environ.get("GRAFT_BENCH_DOCS")
    if override:
        return int(override)
    import pyarrow.parquet as pq

    n_documents = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return int(min(500_000, max(1_000, 100 * n_documents)))


def ensure_corpus(sf_dir: str) -> tuple[str, int]:
    """Generate (once) the deterministic CC-style corpus for this sf
    tier and warm the page cache; returns (corpus_dir, n_docs)."""
    from event_deduplication_ray import fixtures as F

    n = corpus_docs_for(sf_dir)
    d = F.materialize_corpus(CORPUS_ROOT, n, seed=42,
                             base_texts=F.load_base_texts(sf_dir))
    import glob

    for fp in glob.glob(f"{d}/docs/*.parquet"):    # warm page cache
        with open(fp, "rb") as f:
            while f.read(1 << 24):
                pass
    return d, n


def run_flagship(corpus_dir: str, repeats: int | None = None) -> float:
    """Best-of-N timed runs after one tiny warmup pipeline.

    The warmup spawns + import-loads every Ray worker so the timed
    runs measure the pipeline, not process bootstrap.  Best-of-3
    because this sandbox's page-fault cost varies 2-3x run-to-run
    (virtualized memory; see BASELINE.md) — the minimum reflects the
    engine, the variance reflects the host.  GRAFT_BENCH_REPEATS
    overrides N (e.g. 1 for the multi-hour 8M size-sweep legs, whose
    best-of comes from --scaling's interleaved run pairs instead).
    """
    if repeats is None:
        repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    from event_deduplication_ray import fixtures as F
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path

    # P = max(slots, data/target-partition-size): the floor (32 = the
    # widest level bench tests) keeps every merge wave full; the growth
    # term bounds per-partition memory as data grows.  P is IDENTICAL
    # at both scaling widths — the N-vs-4N runs are the SAME job.  The
    # earlier P=2*NCPU policy made the 32-cpu job carry 16x the shuffle
    # objects of the 8-cpu job (O(P^2) per hop) and measurably
    # anti-scaled the candidate + CC phases; and oversizing P hurts
    # both widths (1M docs interleaved: P=32 26.6-29.9 s vs P=64
    # 37.2-45.7 s @32 cpus; 72.0 s vs 80.9 s @8 cpus) — fewer, larger
    # partitions amortize per-object costs while staying well inside
    # worker memory (~31k docs = ~20 MB text per partition at 1M).
    n_docs = corpus_docs_for(SF_DIR)
    # Round-4 recalibration: ~62.5k docs/partition.  The previous
    # 31,250 rule put 8M docs at P=256, and the O(P^2) sub-table
    # object count dominated: direct A/B at 8M/32cpus measured
    # P=128 148.8s vs P=256 216.5s (clusters identical).  Partitions
    # of ~62.5k docs are still well inside worker memory (~45MB of
    # signature rows each).
    # Round-5 recalibration: cap P at 128 on this host — the O(P^2)
    # shuffle-object count keeps dominating past it (12M direct A/B:
    # P=128 213.7s vs P=192 260.7s @32, clusters identical; matches
    # the round-4 8M finding P=128 148.8s vs P=256 216.5s).  On a
    # real multi-node cluster P grows with node count instead.
    p_override = os.environ.get("GRAFT_BENCH_P")
    cfg = DedupConfig(
        use_substring=True, use_simhash=True,
        join_num_partitions=int(p_override) if p_override
        else max(32, min(128, round(n_docs / 62_500))))
    wd = F.materialize_corpus(CORPUS_ROOT, 1000, seed=42)
    assert dedup_path(f"{wd}/docs", cfg).assignments.count() > 0   # warmup

    best = None
    last = None
    n_clusters = 0
    for _ in range(repeats):
        t0 = time.time()
        res = dedup_path(f"{corpus_dir}/docs", cfg)
        n_docs = res.assignments.count()  # consumes the pipeline
        dt = time.time() - t0
        assert n_docs > 0
        best = dt if best is None else min(best, dt)
        last = res
        n_clusters = res.canonical.count()
    return best, last, n_clusters


def eval_quality(corpus_dir: str, res) -> dict:
    """Recall/precision vs the corpus's golden pairs (the north-rule
    dup-pair recall gate, evaluated at bench scale every round)."""
    import pyarrow.parquet as pq

    from event_deduplication_ray.pipelines.eval import evaluate_pairs

    asn = res.assignments.to_pandas()
    gp = pq.read_table(f"{corpus_dir}/golden_pairs.parquet")
    return evaluate_pairs(asn, gp).as_dict()


def run_queries(sf_dir: str) -> dict[str, float]:
    from event_deduplication_ray.pipelines import queries as Q
    from ray.data import Dataset

    names = [
        "q01_pricing_summary", "q06_user_hourly_windows", "q08_token_counts",
        "q10_exact_dedup", "q11_embedding_topk", "q20_minhash_clusters",
        "q33_decontaminate", "q34_length_quantiles", "q35_top_bigrams",
        "q38_tfidf_topterms", "q46_curation", "q48_distinct_users_hll",
        "q50_shipping_priority", "q54_neardup_decontaminate",
        "q55_regional_revenue", "q64_bigram_lm", "q68_global_rank",
        "q70_rolling_distinct", "q71_vocab", "q74_order_count_histogram",
        "q76_user_running_total", "q78_line_dedup_rewrite", "q79_oov_rate",
        "q82_dsir_weights", "q87_retention_cohorts", "q93_gopher_rules",
        "q102_nation_trade_volume", "q103_returned_item_revenue",
        "q106_lone_late_supplier", "q108_bm25_topk",
        "q109_lexical_diversity", "q110_quality_mix_sample",
        "q115_mixture_draw", "q119_market_share",
        "q122_length_percentile", "q125_effective_tokens",
        "q128_repetition_signals", "q129_exact_substring_spans",
        "q132_dup_triangles", "q133_compression_gate",
        "q135_winnow_dedup", "q136_hopping_windows",
        "q141_hashed_embedding", "q142_contract_audit",
        "q143_table_profile", "q148_fd_audit", "q151_dedup_loss_weights",
        "q158_leakfree_split", "q159_key_skew", "q160_quality_classifier",
        "q166_novelty", "q167_template_dedup", "q168_overlap_stitch",
    ]
    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        r = Q.RAY_QUERIES[name](sf_dir)
        if isinstance(r, Dataset):
            r.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    import ray

    # corpus generation BEFORE ray.init: big corpora (>=1M docs) write
    # shards through a fork pool, and forking a Ray-connected process
    # (grpc threads) is undefined behavior territory
    ensure_corpus(SF_DIR)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    corpus_dir, n_docs = ensure_corpus(SF_DIR)
    flagship_sec, res, n_clusters = run_flagship(corpus_dir)
    only_flagship = os.environ.get("GRAFT_BENCH_ONLY") == "flagship"
    qtimes = {} if only_flagship else run_queries(SF_DIR)
    quality = {} if only_flagship else eval_quality(corpus_dir, res)
    result = {
        "metric": "flagship_dedup_sec",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "corpus_docs": n_docs,
        "docs_per_sec": round(n_docs / flagship_sec, 1),
        "n_clusters": n_clusters,
        "quality": quality,
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    # generate + warm input once, outside the timed runs
    from event_deduplication_ray import fixtures as F  # noqa: F401

    ensure_corpus(SF_DIR)

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_ONLY="flagship",
                   EDR_TASK_CPUS="1")
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # INTERLEAVED lo/hi runs, best per level: this host's wall time
    # for an identical config drifts up to 2x across a session
    # (virtualized memory; measured 32s -> 56s for the same run), so
    # adjacent-in-time pairs + min are the only honest comparison
    r_lo, r_hi = run(lo), run(hi)
    r_lo2, r_hi2 = run(lo), run(hi)
    if r_lo2["value"] < r_lo["value"]:
        r_lo = r_lo2
    if r_hi2["value"] < r_hi["value"]:
        r_hi = r_hi2
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    kern = kernel_scaling(lo, hi)
    print(json.dumps({
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        # determinism across parallelism levels (FIXTURES.md §3):
        # both fresh processes must produce the same clustering
        "n_clusters_8": r_lo["n_clusters"], "n_clusters_32": r_hi["n_clusters"],
        "clusters_equal": r_lo["n_clusters"] == r_hi["n_clusters"],
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "corpus_docs": r_hi["corpus_docs"],
        "scaling_efficiency": round(eff, 3),
        "kernel_scaling": kern,
    }))


def kernel_scaling(lo: int, hi: int) -> dict:
    """Supplementary evidence: the signature KERNELS + Ray scheduling
    scale near-linearly when the host's memory-virtualization
    contention is out of the picture (allocation-light tasks over
    pre-broadcast data).  End-to-end efficiency above is capped by
    that host effect (page faults measured at 15-20 us with
    mmap-level contention across workers — see BASELINE.md)."""

    code = r'''
import ray, time, numpy as np, os, json, sys
sys.path.insert(0, os.path.dirname(%r))
ncpu = int(os.environ["KNC"])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from event_deduplication_ray.functions import hashing as H

@ray.remote
def work(seed):
    rng = np.random.default_rng(seed)
    sh = rng.integers(0, 2**63, 120_000).astype(np.uint64)
    spd = np.full(400, 300)
    mults, adds = H.perm_constants(128, 42)
    for _ in range(10):
        sig = H.minhash_signatures(sh, spd, mults, adds)
    return int(sig[0, 0])

ray.get([work.remote(i) for i in range(8)])   # warm workers
t0 = time.time()
ray.get([work.remote(i) for i in range(96)])
print(json.dumps({"sec": round(time.time() - t0, 2)}))
ray.shutdown()
''' % os.path.abspath(__file__)

    def krun(ncpu: int) -> float:
        env = dict(os.environ, KNC=str(ncpu))
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])["sec"]

    k_lo, k_hi = krun(lo), krun(hi)
    host = host_compute_scaling(lo, hi)
    return {"sec_8": k_lo, "sec_32": k_hi,
            "efficiency": round((k_lo / k_hi) / (hi / lo), 3),
            "host_compute_ceiling": host}


def _burn(_):
    import numpy as np

    x = np.arange(100_000, dtype=np.float64)
    for _ in range(600):
        x = np.sqrt(x * 1.0001)
    return float(x[0])


def _alloc_burn(_):
    import numpy as np

    # allocate + first-touch fresh pages, the way any data engine's
    # shuffle/concat buffers do
    s = 0.0
    for _ in range(4):
        x = np.empty(8_000_000, dtype=np.float64)  # 64 MB
        x[:] = 1.0
        s = float(x.sum())
    return s


def host_compute_scaling(lo: int, hi: int) -> dict:
    """Controls: raw multiprocessing.Pool, no Ray.

    - compute: allocation-free numpy — the host's parallel-speedup
      ceiling for pure arithmetic;
    - alloc: the same pool but each task touches fresh 64 MB buffers —
      the ceiling for ANY workload that allocates memory.  On this
      box page-fault cost is globally contended (virtualized memory):
      the alloc control ANTI-scales (more processes = slower), which
      bounds what any data engine, Ray or not, can show in-sandbox.
    """
    import multiprocessing as mp

    def prun(fn, n: int) -> float:
        with mp.Pool(n) as pool:
            pool.map(fn, range(n))          # warm
            t0 = time.time()
            pool.map(fn, range(96))
            return round(time.time() - t0, 2)

    p_lo, p_hi = prun(_burn, lo), prun(_burn, hi)
    a_lo, a_hi = prun(_alloc_burn, lo), prun(_alloc_burn, hi)
    return {"sec_8": p_lo, "sec_32": p_hi,
            "efficiency": round((p_lo / p_hi) / (hi / lo), 3),
            "alloc_sec_8": a_lo, "alloc_sec_32": a_hi,
            "alloc_efficiency": round((a_lo / a_hi) / (hi / lo), 3)}


def ablation() -> None:
    """Tier-ablation side-by-side (reference E6 analog): P/R/F1 +
    wall time per candidate-tier config over one 50k-doc corpus."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import pyarrow.parquet as pq

    from event_deduplication_ray import fixtures as F
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.eval import tier_ablation

    n = min(50_000, corpus_docs_for(SF_DIR))
    d = F.materialize_corpus(CORPUS_ROOT, n, seed=42,
                             base_texts=F.load_base_texts(SF_DIR))
    gp = pq.read_table(f"{d}/golden_pairs.parquet")
    cfg = DedupConfig(join_num_partitions=32)
    df = tier_ablation(f"{d}/docs", gp, base_cfg=cfg)
    ray.shutdown()
    print(json.dumps({"metric": "tier_ablation", "corpus_docs": n,
                      "num_cpus": NCPU,
                      "rows": df.to_dict(orient="records")}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--ablation" in sys.argv:
        ablation()
    else:
        main()
