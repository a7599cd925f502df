"""CLI entry points (reference analog: S11 export CLI + worker main,
/root/reference/src/event_dedup/cli/__main__.py:18-96).

Usage (the only place outside bench/tests that owns a Ray session):
  python -m event_deduplication_ray.cli run --input DIR_OR_FILE \
      --run-dir RUNDIR [--num-cpus N] [--substring] [--simhash]
  python -m event_deduplication_ray.cli export --run-dir RUNDIR \
      --output-dir OUT [--first-ts-after TS]
  python -m event_deduplication_ray.cli eval --run-dir RUNDIR \
      --golden-pairs PATH
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None) -> None:
    import os

    import ray

    if not ray.is_initialized():
        # EDR_RAY_ADDRESS connects to an EXISTING cluster (the
        # multi-node drill / `ray start` deployments); default is a
        # fresh local session.  num_cpus only applies locally — a
        # cluster's size is the cluster's.
        addr = os.environ.get("EDR_RAY_ADDRESS", "local")
        kwargs = dict(address=addr, include_dashboard=False,
                      logging_level="ERROR")
        if num_cpus and addr == "local":
            kwargs["num_cpus"] = num_cpus
        elif num_cpus:
            import sys

            print(f"warning: --num-cpus={num_cpus} ignored — "
                  f"EDR_RAY_ADDRESS={addr!r} connects to an existing "
                  "cluster whose size is fixed", file=sys.stderr)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_run(args: argparse.Namespace) -> int:
    _ray_init(args.num_cpus)
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.dedup_pipeline import dedup_path_resumable

    cfg = DedupConfig(use_substring=args.substring, use_simhash=args.simhash,
                      canonicalize_urls=args.canonicalize_urls)
    res = dedup_path_resumable(args.input, args.run_dir, cfg)
    print(json.dumps(res.metrics))
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    _ray_init(args.num_cpus)
    import ray.data as rd

    from event_deduplication_ray.pipelines.export import (
        export_canonical_parquet,
        export_deduped_corpus,
    )

    part = args.partition_by.split(",") if args.partition_by else None
    if args.corpus:
        # the training-data product: full-text corpus minus
        # non-representative duplicates
        m = export_deduped_corpus(
            args.run_dir, args.output_dir,
            partition_by=part, rows_per_file=args.rows_per_file,
            fmt="jsonl.gz" if args.jsonl_gz else "parquet",
        )
        print(json.dumps({"output_dir": args.output_dir, **m}))
        return 0
    canonical = rd.read_parquet(f"{args.run_dir}/canonical")
    out = export_canonical_parquet(
        canonical, args.output_dir,
        first_ts_after=args.first_ts_after,
        rows_per_file=args.rows_per_file,
        partition_by=part,
    )
    print(json.dumps({"output_dir": out}))
    return 0


def cmd_eval(args: argparse.Namespace) -> int:
    _ray_init(args.num_cpus)
    import pyarrow.parquet as pq
    import ray.data as rd

    from event_deduplication_ray.pipelines.eval import evaluate_pairs_ds

    # only the golden docs' assignment rows are collected (bounded by
    # the labeled pair table) — the corpus-sized table stays a Dataset
    asn = rd.read_parquet(f"{args.run_dir}/assignments")
    gp = pq.read_table(args.golden_pairs)
    print(json.dumps(evaluate_pairs_ds(asn, gp).as_dict()))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run any battery entry (pipelines/queries.py) from the CLI —
    the ad-hoc analytics surface (reference Q1-Q7 analog exposed as a
    command).  Writes Parquet when --output is given, else prints up
    to --limit rows as JSONL."""
    _ray_init(args.num_cpus)
    import pandas as pd

    from event_deduplication_ray.pipelines.queries import RAY_QUERIES

    if args.name not in RAY_QUERIES:
        known = ", ".join(sorted(RAY_QUERIES))
        print(json.dumps({"error": f"unknown query {args.name!r}",
                          "known": known}), file=sys.stderr)
        return 2
    res = RAY_QUERIES[args.name](args.sf_dir)
    if args.output:
        if isinstance(res, pd.DataFrame):
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(res, preserve_index=False),
                           args.output)
        else:
            res.write_parquet(args.output)
        print(json.dumps({"output": args.output}))
        return 0
    if not isinstance(res, pd.DataFrame):
        res = res.limit(args.limit).to_pandas()
    for c in res.columns:
        if pd.api.types.is_datetime64_any_dtype(res[c]):
            res[c] = res[c].astype(str)
    print(res.head(args.limit).to_json(orient="records", lines=True))
    return 0


def cmd_index(args: argparse.Namespace) -> int:
    """Posting-list index lifecycle from the shell: build once, add
    new shards incrementally, serve AND/OR term searches reading only
    the matching token shards (stages/textindex.py)."""
    _ray_init(args.num_cpus)
    import ray.data as rd

    from event_deduplication_ray.stages import textindex as TI

    if args.action == "build":
        build = TI.phrase_index_build if args.phrase \
            else TI.token_index_build
        build(rd.read_parquet(args.input), args.index_dir)
        print(json.dumps({"index_dir": args.index_dir, "action": "build",
                          "phrase": bool(args.phrase)}))
        return 0
    if args.action == "add":
        TI.token_index_add(rd.read_parquet(args.input), args.index_dir)
        print(json.dumps({"index_dir": args.index_dir, "action": "add"}))
        return 0
    terms = [t for t in (args.terms or "").split(",") if t]
    if not terms:
        print(json.dumps({"error": "search needs --terms a,b,..."}),
              file=sys.stderr)
        return 2
    if args.phrase:
        hits = TI.phrase_search(args.index_dir, terms)
        print(json.dumps({"terms": [t.lower() for t in terms],
                          "mode": "phrase",
                          "n_hits": int(len(hits)),
                          "doc_ids": hits["doc_id"].tolist()[:args.limit]}))
        return 0
    hits = TI.token_index_search(args.index_dir, terms, mode=args.mode)
    print(json.dumps({"terms": sorted(set(t.lower() for t in terms)),
                      "mode": args.mode,
                      "n_hits": int(len(hits)),
                      "doc_ids": hits["doc_id"].tolist()[:args.limit]}))
    return 0


def cmd_add(args: argparse.Namespace) -> int:
    """Incremental ingest (reference S5 watcher analog): fold a new
    docs batch into a checkpointed run WITHOUT re-scoring the world —
    candidate generation is semi-joined to the new docs' band keys,
    so cost scales with the batch.  Loads the run's persisted config
    unless overridden."""
    _ray_init(args.num_cpus)
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.incremental import incremental_add
    from event_deduplication_ray.state.runstate import load_run_config

    cfg = load_run_config(args.run_dir) or DedupConfig()
    res = incremental_add(args.run_dir, args.input, cfg)
    # distributed summary — NOT a full-assignments to_pandas collect
    from event_deduplication_ray.pipelines.incremental import (
        assignment_summary,
    )

    summ = assignment_summary(res.assignments, cfg.join_num_partitions)
    if args.persist:
        from event_deduplication_ray.pipelines.incremental import (
            persist_incremental,
        )

        persist_incremental(args.run_dir, res, cfg, args.input)
    print(json.dumps({
        "n_docs": summ["n_docs"],
        "n_clusters": summ["n_clusters"],
        "persisted": bool(args.persist),
    }))
    return 0


def cmd_screen(args: argparse.Namespace) -> int:
    """READ-ONLY admission control: screen a candidate batch against
    a checkpointed corpus (is each doc a dup, of what, at which tier)
    without mutating the run dir — the cheap question to ask BEFORE
    `add`.  Prints a summary line; --output writes the per-doc
    verdict table."""
    _ray_init(args.num_cpus)
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.incremental import screen_docs
    from event_deduplication_ray.state.runstate import load_run_config

    cfg = load_run_config(args.run_dir) or DedupConfig()
    got = screen_docs(args.run_dir, args.input, cfg)
    if args.output:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(got, preserve_index=False),
                       args.output)
    print(json.dumps({
        "n_docs": int(len(got)),
        "n_dup": int(got["is_dup"].sum()),
        "n_novel": int((~got["is_dup"]).sum()),
        "by_tier": {k: int(v) for k, v in
                    got.loc[got["is_dup"], "tier"]
                    .value_counts().items()},
    }))
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    """Pair-level match explanation (review surface): per-tier
    evidence for WHY two docs did or didn't match, from the run's
    checkpoints."""
    _ray_init(args.num_cpus)
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.review import explain_pair
    from event_deduplication_ray.state.runstate import load_run_config

    cfg = load_run_config(args.run_dir) or DedupConfig()
    try:
        a, b = (int(x) for x in args.ids.split(","))
    except ValueError:
        print(json.dumps({"error": "--ids wants 'id_a,id_b'"}))
        return 2
    print(json.dumps(explain_pair(args.run_dir, a, b, cfg)))
    return 0


def cmd_remove(args: argparse.Namespace) -> int:
    """Deletion propagation (watcher REMOVE / GDPR-delete): drop docs
    and their edges from a checkpointed run, re-run CC so a removed
    bridge doc splits its cluster, and persist the new state."""
    _ray_init(args.num_cpus)
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.incremental import (
        incremental_remove,
        persist_incremental,
    )
    from event_deduplication_ray.state.runstate import load_run_config

    cfg = load_run_config(args.run_dir) or DedupConfig()
    ids = [int(x) for x in args.doc_ids.split(",") if x.strip()]
    res = incremental_remove(args.run_dir, ids, cfg)
    # distributed summary — NOT a full-assignments to_pandas collect
    from event_deduplication_ray.pipelines.incremental import (
        assignment_summary,
    )

    summ = assignment_summary(res.assignments, cfg.join_num_partitions)
    if args.persist:
        persist_incremental(args.run_dir, res, cfg,
                            f"remove:{len(ids)}-ids")
    print(json.dumps({
        "n_removed": res.metrics["n_removed"],
        "n_docs": summ["n_docs"],
        "n_clusters": summ["n_clusters"],
        "persisted": bool(args.persist),
    }))
    return 0


def cmd_update(args: argparse.Namespace) -> int:
    """Snapshot-driven watcher update: diff a new corpus snapshot
    against the run dir's extracted state, then remove+re-add only the
    delta (both halves persist back into the run dir, so the next
    snapshot chains)."""
    _ray_init(args.num_cpus)
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.pipelines.incremental import incremental_update
    from event_deduplication_ray.state.runstate import load_run_config

    cfg = load_run_config(args.run_dir) or DedupConfig()
    delta = incremental_update(args.run_dir, args.input, cfg)
    # distributed summary — NOT a full-assignments driver read
    import ray.data as rd

    from event_deduplication_ray.pipelines.incremental import (
        assignment_summary,
    )

    summ = assignment_summary(
        rd.read_parquet(f"{args.run_dir}/assignments"),
        cfg.join_num_partitions)
    print(json.dumps({
        **delta,
        "n_docs": summ["n_docs"],
        "n_clusters": summ["n_clusters"],
    }))
    return 0


def cmd_review(args: argparse.Namespace) -> int:
    """Review surgery against a run dir (reference R1/R2 exposed as
    commands): split detaches a doc (optionally onto a target
    cluster), merge forces a donor cluster onto a survivor — both
    append durably to the run dir's audit log — and apply replays the
    audit trail over the computed assignments, writing the edited
    assignment table to --output-dir."""
    _ray_init(args.num_cpus)
    import ray.data as rd

    from event_deduplication_ray.pipelines import review as RV

    log = RV.AuditLog(args.run_dir)
    audit = log.load()
    edits = RV.edits_from_audit(audit)

    if args.action == "split":
        edits, audit = RV.split_doc(
            edits, audit, args.doc_id,
            target_cluster_id=args.target, operator=args.operator,
            log=log)
        print(json.dumps({"action": "split", "doc_id": args.doc_id,
                          "n_edits": int(len(edits)),
                          "n_audit_rows": int(len(audit))}))
        return 0
    asn = rd.read_parquet(f"{args.run_dir}/assignments")
    if args.action == "merge":
        # merge only reads the DONOR cluster's members — filter
        # distributedly, collect O(donor-cluster) rows, not the corpus
        import pyarrow.compute as pc

        donor = int(args.donor)
        donor_rows = asn.map_batches(
            lambda t: t.filter(pc.equal(t["cluster_id"], donor)),
            batch_format="pyarrow",
        ).to_pandas()
        edits, audit = RV.merge_clusters(
            edits, audit, donor_rows, args.donor, args.survivor,
            operator=args.operator, log=log)
        print(json.dumps({"action": "merge", "donor": args.donor,
                          "survivor": args.survivor,
                          "n_edits": int(len(edits)),
                          "n_audit_rows": int(len(audit))}))
        return 0
    # apply: replay audit over assignments into --output-dir
    from event_deduplication_ray.config import DedupConfig
    from event_deduplication_ray.state.runstate import load_run_config

    cfg = load_run_config(args.run_dir) or DedupConfig()
    out = RV.apply_edits(asn, edits, cfg)
    out.write_parquet(args.output_dir)
    n = out.count()
    print(json.dumps({"action": "apply", "n_rows": int(n),
                      "n_edits": int(len(edits)),
                      "output_dir": args.output_dir}))
    return 0


def cmd_compare(args: argparse.Namespace) -> int:
    """Run-to-run clustering drift (eval.compare_runs): ARI plus
    split/merge/moved counts between two run dirs' assignment tables
    — the audit a config patch or incremental add should be judged
    by before its output replaces the previous run's."""
    _ray_init(args.num_cpus)
    import ray.data as rd

    from event_deduplication_ray.pipelines.eval import compare_runs_ds

    # distributed contingency partials — no O(corpus) driver frame
    a = rd.read_parquet(f"{args.run_dir_a}/assignments") \
        .select_columns(["doc_id", "cluster_id"])
    b = rd.read_parquet(f"{args.run_dir_b}/assignments") \
        .select_columns(["doc_id", "cluster_id"])
    m = compare_runs_ds(a, b)
    print(json.dumps(m, sort_keys=True))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Small-file maintenance (the OPTIMIZE verb): rewrite a run dir's
    stages — or a hive-partitioned index dir's shards — into
    target-sized Parquet files.  Shuffle-free (whole-file concat per
    output block), content-asserted against the manifest, atomic swap
    per directory."""
    _ray_init(args.num_cpus)
    from event_deduplication_ray.state.compact import (
        compact_index_dir,
        compact_run_dir,
    )

    if args.index_dir:
        out = compact_index_dir(args.index_dir, args.target_rows)
    else:
        from event_deduplication_ray.state.compact import gc_run_dir

        out = compact_run_dir(args.run_dir, args.target_rows)
        out["_gc_removed"] = gc_run_dir(args.run_dir)
    print(json.dumps(out, sort_keys=True))
    return 0


def cmd_report(args: argparse.Namespace) -> int:
    """One-shot corpus health report: composes the cheap battery
    readouts (doc counts, language distribution, quality quantiles,
    exact-dup rate, per-source duplication, dedup-adjusted effective
    tokens) into a single JSON — the summary a curation run starts
    from."""
    _ray_init(args.num_cpus)
    from event_deduplication_ray.pipelines import queries as Q

    sf = args.sf_dir
    rep: dict = {}
    langs = Q.q07_lang_distribution(sf)
    rep["n_docs"] = int(langs["n_docs"].sum())
    rep["langs"] = dict(zip(langs["lang"], langs["n_docs"].astype(int)))
    ql = Q.q34_length_quantiles(sf)
    rep["length_quantiles"] = {
        r["lang"]: {"p50": int(r["p50"]), "p99": int(r["p99"])}
        for _, r in ql.iterrows()}
    dup = Q.q91_dup_cluster_sizes(sf)
    multi = dup[dup["cluster_size"] > 1]
    rep["dup_clusters_multi"] = int(multi["n_clusters"].sum())
    rep["dup_docs"] = int(
        (multi["cluster_size"] * multi["n_clusters"]).sum())
    src = Q.q139_source_dup_rate(sf)
    rep["source_dup_ppm"] = dict(
        zip(src["source"], src["dup_ppm"].astype(int)))
    eff = Q.q125_effective_tokens(sf)
    rep["effective_tokens"] = {
        k: int(eff[k].iloc[0]) for k in
        ("total_tokens", "kept_tokens", "dup_token_ppm")
        if k in eff.columns}
    print(json.dumps(rep, sort_keys=True))
    return 0


def cmd_fsck(args: argparse.Namespace) -> int:
    """Run-dir consistency audit (state/validate.py): cross-stage
    invariants — manifest row counts, assignment/extracted coverage,
    edge-endpoint membership, canonical/cluster-id agreement, member
    sums, rep-doc membership.  Exit 1 when any check fails."""
    _ray_init(args.num_cpus)
    from event_deduplication_ray.state.validate import validate_run_dir

    out = validate_run_dir(args.run_dir)
    print(json.dumps(out, sort_keys=True))
    return 0 if out["ok"] else 1


def cmd_config(args: argparse.Namespace) -> int:
    """Run-config get/patch (reference Q8): get prints the persisted
    config.json; patch deep-merges `key=json_value` pairs (dotted
    keys nest) and writes it back — the config fingerprint then
    invalidates stale checkpoints on the next run."""
    from event_deduplication_ray.config import config_to_dict
    from event_deduplication_ray.state.runstate import (
        load_run_config,
        patch_run_config,
    )

    if args.action == "get":
        cfg = load_run_config(args.run_dir)
        if cfg is None:
            print(json.dumps({"error": "no config.json in run dir"}),
                  file=sys.stderr)
            return 2
        print(json.dumps(config_to_dict(cfg), sort_keys=True))
        return 0
    patch: dict = {}
    for item in args.set or []:
        if "=" not in item:
            print(json.dumps({"error": f"--set expects key=value: {item!r}"}),
                  file=sys.stderr)
            return 2
        key, _, raw = item.partition("=")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        node = patch
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    cfg = patch_run_config(args.run_dir, patch)
    print(json.dumps(config_to_dict(cfg), sort_keys=True))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="event_deduplication_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run")
    pr.add_argument("--input", required=True)
    pr.add_argument("--run-dir", required=True)
    pr.add_argument("--substring", action="store_true")
    pr.add_argument("--simhash", action="store_true")
    pr.add_argument("--canonicalize-urls", action="store_true",
                    help="fold tracking-variant urls to one doc at "
                         "extract (persisted in the run config)")
    pr.set_defaults(fn=cmd_run)

    pe = sub.add_parser("export")
    pe.add_argument("--run-dir", required=True)
    pe.add_argument("--output-dir", required=True)
    pe.add_argument("--first-ts-after", default=None)
    pe.add_argument("--rows-per-file", type=int, default=10_000)
    pe.add_argument("--corpus", action="store_true",
                    help="export the DEDUPED full-text corpus (one "
                         "surviving doc per cluster) instead of the "
                         "canonical cluster table")
    pe.add_argument("--partition-by", default=None,
                    help="comma-separated hive partition columns")
    pe.add_argument("--jsonl-gz", action="store_true",
                    help="write the corpus as gzipped JSON-lines "
                         "parts instead of Parquet (with --corpus)")
    pe.set_defaults(fn=cmd_export)

    pv = sub.add_parser("eval")
    pv.add_argument("--run-dir", required=True)
    pv.add_argument("--golden-pairs", required=True)
    pv.set_defaults(fn=cmd_eval)

    pq_ = sub.add_parser("query")
    pq_.add_argument("name")
    pq_.add_argument("--sf-dir", required=True)
    pq_.add_argument("--output", default=None)
    pq_.add_argument("--limit", type=int, default=20)
    pq_.set_defaults(fn=cmd_query)

    pi = sub.add_parser("index")
    pi.add_argument("action", choices=["build", "add", "search"])
    pi.add_argument("--index-dir", required=True)
    pi.add_argument("--input", default=None)
    pi.add_argument("--terms", default=None)
    pi.add_argument("--mode", choices=["and", "or"], default="and")
    pi.add_argument("--phrase", action="store_true",
                    help="positional index: ordered-phrase semantics")
    pi.add_argument("--limit", type=int, default=100)
    pi.set_defaults(fn=cmd_index)

    pa_ = sub.add_parser("add")
    pa_.add_argument("--run-dir", required=True)
    pa_.add_argument("--input", required=True)
    pa_.add_argument("--persist", action="store_true",
                     help="fold the result back into the run dir so "
                          "the next add chains on it (watcher loop)")
    pa_.set_defaults(fn=cmd_add)

    psc = sub.add_parser("screen")
    psc.add_argument("--run-dir", required=True)
    psc.add_argument("--input", required=True)
    psc.add_argument("--output", default=None,
                     help="optional Parquet path for the per-doc verdicts")
    psc.set_defaults(fn=cmd_screen)

    pex = sub.add_parser("explain")
    pex.add_argument("--run-dir", required=True)
    pex.add_argument("--ids", required=True,
                     help="comma-separated pair: id_a,id_b")
    pex.set_defaults(fn=cmd_explain)

    prm = sub.add_parser("remove")
    prm.add_argument("--run-dir", required=True)
    prm.add_argument("--doc-ids", required=True,
                     help="comma-separated doc_ids to delete")
    prm.add_argument("--persist", action="store_true")
    prm.set_defaults(fn=cmd_remove)

    pu = sub.add_parser("update")
    pu.add_argument("--run-dir", required=True)
    pu.add_argument("--input", required=True,
                    help="path to the NEW corpus snapshot")
    pu.set_defaults(fn=cmd_update)

    prv = sub.add_parser("review")
    prv.add_argument("action", choices=["split", "merge", "apply"])
    prv.add_argument("--run-dir", required=True)
    prv.add_argument("--doc-id", type=int, default=None)
    prv.add_argument("--target", type=int, default=None)
    prv.add_argument("--donor", type=int, default=None)
    prv.add_argument("--survivor", type=int, default=None)
    prv.add_argument("--operator", default="cli")
    prv.add_argument("--output-dir", default=None)
    prv.set_defaults(fn=cmd_review)

    pc = sub.add_parser("config")
    pc.add_argument("action", choices=["get", "patch"])
    pc.add_argument("--run-dir", required=True)
    pc.add_argument("--set", action="append", default=None)
    pc.set_defaults(fn=cmd_config)

    pco = sub.add_parser("compact")
    g = pco.add_mutually_exclusive_group(required=True)
    g.add_argument("--run-dir")
    g.add_argument("--index-dir")
    pco.add_argument("--target-rows", type=int, default=1_000_000)
    pco.set_defaults(fn=cmd_compact)

    prp = sub.add_parser("report")
    prp.add_argument("--sf-dir", required=True)
    prp.set_defaults(fn=cmd_report)

    pfs = sub.add_parser("fsck")
    pfs.add_argument("--run-dir", required=True)
    pfs.set_defaults(fn=cmd_fsck)

    pcm = sub.add_parser("compare")
    pcm.add_argument("--run-dir-a", required=True)
    pcm.add_argument("--run-dir-b", required=True)
    pcm.set_defaults(fn=cmd_compare)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
