"""Device-trace bucket analysis of the steady-state train step.

Reproduces the "where the step goes" tables in RESULTS.md as a committed
tool (the r3 versions were /tmp one-offs): traces N steady-state steps of
the flagship bench workload (same model/shape/gate mix as bench.py's
headline metric), parses the xplane protobuf, and prints

  1. total device-busy time grouped by HLO category ("convolution fusion",
     "data formatting", "custom-call", ...), per step
  2. the top individual ops inside the categories under attack, with their
     HLO names so the producing op can be located in the lowering.

Usage: python benchmarks/trace_buckets.py [--steps 12] [--category "data formatting"]
       [--top 25] [--logdir /tmp/njf_trace]
"""

import argparse
import collections
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax


def capture(logdir: str, steps: int, mode: str = "perception"):
    import bench  # repo-root bench.py: flagship workload builders

    from neural_jacobian_field_tpu.training import (
        TrainCfg, create_train_state, host_step_schedule, make_train_step,
    )

    key = jax.random.PRNGKey(0)
    model = bench._flagship_model()
    batch = bench._raw_batch(key, mode=mode)
    cfg = TrainCfg(mode=mode, rays_per_batch=bench.RAYS,
                   warm_up_steps=10000)
    state = create_train_state(key, model, batch, cfg)
    if mode == "action":
        # action stage: single program, no proposal-gate schedule
        # (bench._train_metric's non-perception branch)
        fn = make_train_step(model, cfg, donate=True)
        fns = {True: fn, False: fn}
        sched = [True]
    else:
        fns = {
            True: make_train_step(model, cfg, donate=True, static_updated=True),
            False: make_train_step(model, cfg, donate=True, static_updated=False),
        }
        ssu = 1
        sched = []
        for i in range(6 * ((steps // 6) + 2)):
            up, ssu = host_step_schedule(20000 + i, ssu, model.cfg.rendering)
            sched.append(up)

    # compile/warm both variants outside the trace
    for up in sorted(set(sched)):
        state, metrics = fns[up](state, batch, jax.random.PRNGKey(10))
        bench._sync(metrics["loss/total"])

    with jax.profiler.trace(logdir):
        m = None
        for i in range(steps):
            state, m = fns[sched[i % len(sched)]](
                state, batch, jax.random.PRNGKey(100 + i))
        bench._sync(m["loss/total"])


def load_xspace(logdir: str):
    # The xplane proto lives at tensorflow.tsl.… in this env. Importing full
    # TF inside a process that has been training can fail transiently (TF
    # init under memory pressure raises ImportError); the old fallback chain
    # then masked the real error with a bogus ModuleNotFoundError. Try each
    # known location and report ALL failures if none import.
    errors = []
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf",
                "tensorflow.core.profiler.protobuf",
                "tsl.profiler.protobuf"):
        try:
            xplane_pb2 = __import__(mod + ".xplane_pb2", fromlist=["xplane_pb2"])
            break
        except Exception as e:  # noqa: BLE001 — TF init can raise anything
            errors.append(f"{mod}: {type(e).__name__}: {e}")
    if xplane_pb2 is None:
        raise ImportError("no xplane_pb2 importable:\n  " + "\n  ".join(errors))

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(Path(paths[-1]).read_bytes())
    return xspace


def stat_dict(plane, event):
    out = {}
    for stat in event.stats:
        meta = plane.stat_metadata[stat.metadata_id]
        # discriminate by the populated oneof, not truthiness: a 0.0 double
        # or ref id 0 must not fall through to the int64 branch
        which = stat.WhichOneof("value")
        if which == "str_value":
            out[meta.name] = stat.str_value
        elif which == "ref_value":
            out[meta.name] = plane.stat_metadata[stat.ref_value].name
        elif which == "double_value":
            out[meta.name] = stat.double_value
        elif which == "uint64_value":
            out[meta.name] = stat.uint64_value
        else:
            out[meta.name] = stat.int64_value
    return out


def analyze(xspace, steps: int, focus: str, top: int):
    # The per-op category/flops/bytes live on the EVENT METADATA's stats
    # (hlo_category, flops, bytes_accessed, shape_with_layout), not the
    # event's own stats (those carry only device offsets). Only the exact
    # "XLA Ops" line counts — "Async XLA Ops" overlaps it and would double-
    # count every DMA.
    per_cat = collections.Counter()
    per_op = collections.defaultdict(lambda: [0.0, 0, "", ""])
    dev_planes = [p.name for p in xspace.planes
                  if "TPU" in p.name or "device" in p.name.lower()]
    # durations are SUMMED across device planes; on a multi-core trace the
    # per-step ms would be inflated by the plane count — say so loudly
    # (this box is 1-core, so normally len == 1)
    if len(dev_planes) != 1:
        print(f"WARNING: aggregating {len(dev_planes)} device planes "
              f"{dev_planes}; per-step ms is the SUM across planes",
              file=sys.stderr)
    for plane in xspace.planes:
        if plane.name not in dev_planes:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                mstats = stat_dict(plane, meta)
                cat = str(mstats.get("hlo_category", "?"))
                dur = ev.duration_ps / 1e12 if ev.duration_ps else 0.0
                per_cat[cat] += dur
                rec = per_op[meta.display_name or meta.name]
                rec[0] += dur
                rec[1] += 1
                rec[2] = cat
                rec[3] = str(meta.name)[:220]
    total = sum(per_cat.values())
    print(f"\n== device busy: {total*1e3:.1f} ms over {steps} steps "
          f"=> {total*1e3/steps:.2f} ms/step ==")
    for cat, dur in per_cat.most_common():
        print(json.dumps({"category": cat, "ms_per_step": round(dur * 1e3 / steps, 3),
                          "pct": round(100 * dur / total, 1)}))
    print(f"\n== top {top} ops" + (f" in category ~'{focus}'" if focus else "") + " ==")
    rows = [(v[0], k, v) for k, v in per_op.items()
            if not focus or focus.lower() in v[2].lower()]
    for dur, name, (d, n, cat, expr) in sorted(rows, reverse=True)[:top]:
        print(json.dumps({"op": name, "ms_per_step": round(d * 1e3 / steps, 3),
                          "count": n, "category": cat, "expr": expr}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--category", default="data formatting")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/njf_trace")
    ap.add_argument("--mode", default="perception",
                    choices=("perception", "action"))
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; parse an existing --logdir")
    args = ap.parse_args()
    if not args.parse_only:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path.home() / ".cache" / "njf_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        capture(args.logdir, args.steps, args.mode)
    analyze(load_xspace(args.logdir), args.steps, args.category, args.top)


if __name__ == "__main__":
    main()
