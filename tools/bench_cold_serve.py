"""Cold-cache block-read calibration for the driver serving plan.

VERDICT r4 next #5: the capacity model's stated unknown is "cold-cache
block-read latency on a real object store" (BENCH.md §8) — every
serving bench so far ran with the store in page cache and warm driver
caches. This tool measures the driver-WAND serve under three read
regimes and re-derives the planner's driver-plan constants
(WAND_DRIVER_FLOOR_SEC, DRIVER_DECODE_RATE_POSTINGS_PER_SEC) per
regime:

- **warm**: page cache hot, driver ByteLRU caches warm (the steady
  Zipf-traffic serving state every prior bench measured);
- **cold**: `echo 3 > /proc/sys/vm/drop_caches` before EVERY query +
  a fresh BlockedIndex object (empty skip/meta/block caches) — the
  worst-case first-query-on-a-cold-node shape (local NVMe/disk);
- **shim Nms**: warm page cache but an artificial per-pyarrow-read
  latency injected around the dataset fetches — emulating an object
  store where every GET pays a round trip (S3 first-byte ~30-80 ms;
  the shim default sweeps 10 ms and 50 ms).

Per regime it times the standard driver shapes (rare OR, hot OR via
planner, AND, single-term) with per-query stats (postings decoded), and
fits floor = min latency, rate = Δpostings/Δsec between the lightest
and heaviest non-fallback shape.

Usage:
  python tools/bench_cold_serve.py [--convs 20000] [--trials 5]
Prints one JSON line; paste the table into BENCH.md §6.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def drop_page_cache() -> bool:
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as dc:
            dc.write("3\n")
        return True
    except OSError:
        return False


class SlowDataset:
    """Delegating proxy over a pyarrow dataset adding a fixed latency
    per fetch call — the object-store GET emulation (pyarrow's dataset
    classes are immutable C types, so the proxy replaces the index's
    MEMOIZED dataset handle instead of patching the class)."""

    def __init__(self, ds, sec: float):
        self._ds, self._sec = ds, sec

    def __getattr__(self, name):
        return getattr(self._ds, name)

    def to_table(self, *a, **k):
        time.sleep(self._sec)
        return self._ds.to_table(*a, **k)

    def scanner(self, *a, **k):
        time.sleep(self._sec)
        return self._ds.scanner(*a, **k)


def shim_index(bidx, ms: float):
    """Force-materialize the driver dataset handle, then wrap it."""
    from nexlt_spark.query.wand import _pa_ds

    _pa_ds(bidx)  # memoizes bidx._pa_dataset
    bidx._pa_dataset = SlowDataset(bidx._pa_dataset, ms / 1000.0)
    return bidx


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=20000)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--shims-ms", default="10,50")
    args = ap.parse_args()

    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.blocks import load_blocked_index
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked
    from nexlt_spark.query.planner import topk_rows
    from nexlt_spark.session import get_spark
    from nexlt_spark.synth import synth_transcripts

    spark = get_spark(
        app_name="cold-serve",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    store = os.path.join(tempfile.mkdtemp(prefix="nexlt_cold_"), "store")
    docs = flatten_transcripts(
        synth_transcripts(spark, n_convs=args.convs, seed=42)
    ).persist()
    save_blocked(build_blocked_direct(docs), store)
    n_docs = docs.count()

    SHAPES = {
        "or_rare": (["spark", "index", "merge"], "or"),
        "or_hot": (["the", "error"], "or"),
        "and": (["run", "file"], "and"),
        "single": (["error"], "or"),
    }

    def run_query(bidx, name):
        terms, mode = SHAPES[name]
        stats: dict = {}
        t0 = time.perf_counter()
        topk_rows(bidx, terms, k=10, mode=mode, stats_out=stats)
        return time.perf_counter() - t0, stats

    def fresh_index():
        return load_blocked_index(spark, store)

    results: dict = {}

    # ---- warm: one shared index, caches warmed by a full pass ----------
    bidx = fresh_index()
    for name in SHAPES:
        run_query(bidx, name)
    warm = {}
    for name in SHAPES:
        lats = [run_query(bidx, name)[0] for _ in range(args.trials)]
        warm[name] = round(statistics.median(lats), 4)
    results["warm"] = warm

    # ---- cold: fresh index object + dropped page cache per query -------
    cold = {}
    can_drop = drop_page_cache()
    for name in SHAPES:
        lats = []
        for _ in range(args.trials):
            drop_page_cache()
            lats.append(run_query(fresh_index(), name)[0])
        cold[name] = round(statistics.median(lats), 4)
    results["cold" if can_drop else "cold(NOT-DROPPED)"] = cold

    # ---- shimmed: warm page cache, per-read latency injected ----------
    for ms in (float(x) for x in args.shims_ms.split(",")):
        shimmed = {}
        for name in SHAPES:
            lats = [
                run_query(shim_index(fresh_index(), ms), name)[0]
                for _ in range(args.trials)
            ]
            shimmed[name] = round(statistics.median(lats), 4)
        results[f"shim_{ms:g}ms"] = shimmed

    # ---- derive planner constants per regime --------------------------
    # DRIVER-routed shapes only (the unfiltered single-term shape routes
    # to the exact Spark plan by design — including it would corrupt the
    # driver-plan floor/rate fit). floor = lightest driver shape; rate =
    # Δpostings/Δsec between the lightest and heaviest driver shapes;
    # reads/query from the latency delta between shim regimes (every
    # added ms/read multiplies the per-query fetch count).
    meta = {}
    bidx = fresh_index()
    from nexlt_spark.query.planner import choose_topk_path
    from nexlt_spark.query.wand import _term_meta

    driver_shapes = [
        nm
        for nm, (terms, mode) in SHAPES.items()
        if choose_topk_path(bidx, terms, 10, mode) == "wand"
    ]
    for name, (terms, _) in SHAPES.items():
        meta[name] = sum(m[0] for m in _term_meta(bidx, sorted(set(terms))).values())
    consts = {}
    for regime, lat in results.items():
        dl = {nm: lat[nm] for nm in driver_shapes}
        if not dl:
            continue
        floor = min(dl.values())
        heavy = max(driver_shapes, key=lambda nm: meta[nm])
        light = min(driver_shapes, key=lambda nm: meta[nm])
        dp, dt = meta[heavy] - meta[light], dl[heavy] - dl[light]
        consts[regime] = {
            "floor_sec": round(floor, 4),
            "rate_postings_per_sec": round(dp / dt) if dt > 1e-4 else None,
        }
    # per-query pyarrow fetch count: slope of added latency vs shim ms
    reads = {}
    shim_ms = sorted(float(x) for x in args.shims_ms.split(","))
    for nm in driver_shapes:
        base = results["warm"][nm]
        est = [
            (results[f"shim_{ms:g}ms"][nm] - base) / (ms / 1000.0)
            for ms in shim_ms
            if f"shim_{ms:g}ms" in results
        ]
        if est:
            reads[nm] = round(statistics.median(est), 1)
    print(
        json.dumps(
            {
                "metric": "cold_serve_calibration",
                "n_docs": n_docs,
                "trials": args.trials,
                "latency_sec": results,
                "postings_per_shape": meta,
                "driver_routed_shapes": driver_shapes,
                "reads_per_query_est": reads,
                "derived_constants": consts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
