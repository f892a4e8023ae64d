"""Benchmark harness.

Headline: the flagship KG-construction pipeline (segment → SVO triples →
entity link → coref → canonicalize → dedup + entities) over synthetic
transcripts scaled to $GRAFT_SF_DIR, plus per-operator timings over the
driver tables.  Prints ONE JSON line.

    python bench.py               # $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling     # fresh 8-cpu and 32-cpu processes,
                                  # reports throughputs + scaling efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _median(vals: list) -> float:
    """True median of a SORTED list: with an even count, picking
    ``vals[n//2]`` would be best-case for throughput but worst-case for
    seconds — an inconsistent (and flattering) estimator."""
    n = len(vals)
    return (vals[n // 2] if n % 2
            else round((vals[n // 2 - 1] + vals[n // 2]) / 2, 3))


def _turns_for(sf_dir: str) -> int:
    import re
    m = re.search(r"sf(\d+\.?\d*)", sf_dir)
    return {"0.001": 2_000, "0.01": 20_000, "0.1": 200_000}.get(
        m.group(1) if m else "", 20_000)


def run_bench(sf_dir: str, ncpu: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from pawpaw_ray.tuning import tune_context
    tune_context()

    import pyarrow.parquet as pq
    from pawpaw_ray.datagen import ensure_transcripts
    from pawpaw_ray.pipelines.kg import build_kg
    from pawpaw_ray.sources.transcripts import read_transcripts
    from pawpaw_ray.tuning import read_blocks_for

    n_turns = int(os.environ.get("GRAFT_BENCH_TURNS", 0)) or _turns_for(sf_dir)
    d = ensure_transcripts(n_turns, use_ray=True)
    catalog = pq.read_table(os.path.join(d, "alias_catalog.parquet"))
    n_blocks = read_blocks_for(ncpu)

    # warm the page cache so we measure compute+shuffle, not first disk read
    read_transcripts(d).count()

    def one_headline() -> tuple[float, int, int]:
        t0 = time.monotonic()
        out = build_kg(read_transcripts(d, override_num_blocks=n_blocks),
                       catalog)
        # consume both outputs CONCURRENTLY: they derive from the same
        # materialized triple rows, so the dedup and entity shuffles overlap
        # instead of serializing (threads each drive one Dataset execution)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(2) as pool:
            f_t = pool.submit(out["triples"].count)
            f_e = pool.submit(out["entities"].count)
            n_t, n_e = f_t.result(), f_e.result()
        return time.monotonic() - t0, n_t, n_e

    # the shared VM swings ~2x run to run (see BASELINE.md): repeat and
    # report the median + all reps so a noise outlier self-identifies
    reps = max(1, int(os.environ.get("GRAFT_BENCH_QUERY_REPS", "3")))
    head_runs = [one_headline() for _ in range(reps)]
    head_secs = sorted(r[0] for r in head_runs)
    headline = _median(head_secs)
    n_triples, n_entities = head_runs[0][1], head_runs[0][2]

    # per-operator timings over the driver tables
    qtimes: dict[str, dict] = {}
    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        names = ()
    else:
        names = ("token_count", "quality", "top_tokens", "dedup_exact",
                 "number_count", "events_window", "events_user_stats",
                 "events_sessions", "events_asof", "events_interval",
                 "events_lag", "events_rolling", "events_hopping",
                 "user_mode_type", "events_funnel", "event_transitions",
                 "user_type_pivot",
                 "user_active_days",
                 "quantiles", "grouped_quantiles", "ann_topk", "ann_topk_lsh",
                 "ann_topk_ivf", "simhash",
                 "minhash_dedup", "near_dup_jaccard", "simhash_clusters",
                 "embedding_near_dup", "segment_stats", "plumule_select",
                 "q1_pricing", "top_customers", "region_revenue",
                 "parts_semi", "parts_anti", "nation_top_customers",
                 "table_extract", "media_features", "xml_extract",
                 "langid", "fingerprint", "repetition_stats",
                 "dedup_keep_best", "common_ngrams", "top_terms",
                 "heavy_hitters", "vocab_approx",
                 "ontology_mentions",
                 "lang_count", "top_sources", "numbers_extract",
                 "str_ops", "format_grid", "xml_ns", "str_esc",
                 "arborform_flow", "postorator_grid", "kg_pagerank",
                 "hash_split", "stratified_sample", "quota_sample",
                 "decontaminate", "dup_spans", "token_pack", "shuffle_order",
                 "doc_chunks")
    if names:
        import pandas as pd
        import __ray_entry__ as entrymod
        q = entrymod.queries()
        # INTERLEAVED reps (rep 1 of every query, then rep 2, ...): a noisy
        # host window then contaminates the same rep index across queries
        # instead of silently doubling one query's only sample — the
        # round-3 bench file's 3x outliers cost a full (phantom)
        # regression investigation
        raw: dict[str, list[float]] = {n: [] for n in names}
        import pyarrow as pa
        for _ in range(reps):
            for name in names:
                t0 = time.monotonic()
                res = q[name](sf_dir)
                if not isinstance(res, (pd.DataFrame, pa.Table)):
                    res.count()  # force execution of lazy Datasets
                raw[name].append(round(time.monotonic() - t0, 3))
        qtimes = {n: {"median": _median(sorted(v)), "reps": v}
                  for n, v in raw.items()}

    result = {
        "metric": "kg_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "n_entities": n_entities,
        "query_reps": reps,
        "all_headline_sec": [round(s, 3) for s in head_secs],
        "turns_per_sec": round(n_turns / headline, 1),
        "triples_per_sec": round(n_triples / headline, 1),
    }
    # bounded-recall / clamp observability (capped LSH buckets, keep-best
    # score clamps): aggregate across all workers, so capped recall is
    # visible from the bench output — empty dict means none fired
    from pawpaw_ray.state.counters import snapshot_events
    result["events"] = snapshot_events()
    ray.shutdown()
    return result


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Same job at two parallelism levels in fresh processes (sandbox
    stand-in for N- vs 4N-node clusters).

    The scaling fixture is 15x the per-round bench size: per-job fixed costs
    (driver, shuffle barriers, worker spin-up — none of which grow with
    cluster size) would otherwise dominate a ~10 s job and mask the scaling
    behavior that matters at 100 TB, where jobs run hours, not seconds.
    """
    n_turns = 15 * (int(os.environ.get("GRAFT_BENCH_TURNS", 0)) or _turns_for(sf_dir))
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))

    def fresh(n: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                   GRAFT_BENCH_TURNS=str(n_turns),
                   GRAFT_BENCH_HEADLINE_ONLY="1",
                   # process-level interleaving IS the rep protocol here;
                   # a second in-process headline rep would just double
                   # each leg's wall time
                   GRAFT_BENCH_QUERY_REPS="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # The sandbox host is a shared VM: single runs swing ~2x with noisy
    # neighbors.  Interleave lo/hi reps and take per-level medians.
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(fresh(lo))
        runs_hi.append(fresh(hi))

    def med(rs, k):
        return _median(sorted(r[k] for r in rs))

    tput_lo, tput_hi = med(runs_lo, "turns_per_sec"), med(runs_hi, "turns_per_sec")
    eff = (tput_hi / tput_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": sf_dir,
        "n_turns": n_turns,
        "reps": reps,
        f"sec_{lo}": med(runs_lo, "value"),
        f"sec_{hi}": med(runs_hi, "value"),
        f"turns_per_sec_{lo}": tput_lo,
        f"turns_per_sec_{hi}": tput_hi,
        f"triples_per_sec_{lo}": med(runs_lo, "triples_per_sec"),
        f"triples_per_sec_{hi}": med(runs_hi, "triples_per_sec"),
        f"all_sec_{lo}": [r["value"] for r in runs_lo],
        f"all_sec_{hi}": [r["value"] for r in runs_hi],
        "cpu_ratio": hi / lo,
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        # Default pair 2 vs 8 (N vs 4N): both levels sit below this single
        # VM's ~16-core memory-bandwidth knee, so the measurement reflects
        # the engine's partitioning rather than the host's shared memory
        # bus (which separate cluster nodes would not share).  8-vs-32 is
        # also measured and reported in BASELINE.md for transparency.
        lo = int(os.environ.get("GRAFT_SCALING_LO", "2"))
        hi = int(os.environ.get("GRAFT_SCALING_HI", "8"))
        print(json.dumps(run_scaling(sf_dir, lo, hi)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, ncpu)))


if __name__ == "__main__":
    main()
