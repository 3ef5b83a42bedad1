"""End-to-end retrieve+refine throughput benchmark.

Measures the fused serving pipeline (retrieval_fuse_tpu/inference.py) at the
flagship ShapeNetV2 super-resolution configuration (nf=16, K=4, latent 64,
ShapeNet-scale database of 27,132 patch rows): raw 8³ df chunk -> patch
encoder -> exact kNN -> patch-bank gather/compose -> U-Net backbone + K-way
attention + decoder -> 64³ TSDF, all in one jitted program on device.

Target (BASELINE.md): >= 5,000 chunks/sec on TPU v5e-8. The reference's
equivalent path is FLANN-on-CPU + disk-composed retrievals + torch forward.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Structure (round 3): the whole measurement ladder runs in ONE kill-able
subprocess that builds the synthetic database/banks once and measures each
engine variant sequentially on the warm transport — round 2's
one-subprocess-per-variant design recompiled everything from scratch per
entry and timed out on a degraded tunnel, so the official number never
captured the fast paths. Results stream line-by-line to a temp file, so a
ladder timeout still keeps every completed measurement; a per-entry
fallback ladder (old style) only runs if the warm ladder produced nothing.

Round 4 — the harness itself must survive an OUTER kill (round 3's driver
timed bench.py out before the single end-of-run JSON print, discarding every
completed measurement):
* the parent TAILS the ladder subprocess's result file live and re-prints the
  best-so-far JSON line after EVERY new measurement, so a SIGKILL at any
  moment >= the first completed measurement still leaves a parseable last
  line on stdout;
* a global wall-clock budget (BENCH_TOTAL_BUDGET_S, default 1380 s — under
  the driver's observed ~25-30 min kill) bounds the whole run, and every
  group/fallback budget derives from the REMAINING time, never from fixed
  constants that can add up past the outer timeout;
* the nothing-measured fallback tries the smallest-compile program FIRST
  (base@8) — on a degraded transport that is the only program with a chance
  of compiling inside the remaining budget.
Set BENCH_SIMULATE=1 to replace measurements with timed fake rows (no jax) —
used by tests/test_bench_harness.py to SIGKILL the harness mid-run and
assert the last stdout line is still valid JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Ladder GROUPS, each its own kill-able subprocess with its own timeout —
# round-3 lesson: ONE hung remote compile can eat the whole budget, so the
# proven fast paths (group A) must never queue behind experimental entries.
# Measured round-2/3 on one v5e chip (chained): fused@256 842.7,
# fused+pallas@128 842.2 vs base@64 501.8 chunks/sec. Batch-256 programs are
# where the remote compiler has failed historically (r2 "rc=1" = HTTP 500
# tpu_compile_helper, diagnosed r3) -> they live in group B. Variants:
# fused = upsample folded into the decoder conv (8x MXU lanes); packed =
# additionally the second conv + 1x1 head space-to-depth-packed onto the 32³
# grid (128 lanes end-to-end); pallas = fused attention kernel. "simple"
# mode pipelines distinct inputs with one forcing fetch (best honest
# throughput through a high-latency tunnel); "chained" serializes through
# data deps (true device time).
LADDER_GROUPS = [
    [  # A: proven, compile-reliable (pallasp = packed-row gather + flat
       #    attention kernel — the fastest measured variant; pallas = packed
       #    feed into the flat kernel). The tiny base@8 leads as evidentiary
       #    insurance: it compiles in ~15 s on a healthy transport, so ANY
       #    later kill/timeout still leaves a nonzero official number.
       #    Trimmed r4: the fused@128 / fused+pallas@128 rows are superseded
       #    by the pallasp rows and only burned group-B budget; attribution
       #    now lives in bench_ablate.py.
        ("simple", 8, "base"),
        ("simple", 128, "fused+pallasp"),
    ],
    [  # B: larger batches (the old layout chain's batch-256 program killed
       #    the remote compile helper r2; the pallasp program compiles —
       #    measured r3: 1625.0 / 1617.5 chained / 1253.3). Best-first so a
       #    degraded-transport timeout still keeps the strongest number.
       #    topk1p = single-HBM-pass top-k select (ops/pallas_topk) replacing
       #    the k+1-pass iterative select (19.5 ms/batch HBM floor -> 2.2,
       #    ROOFLINE.md; measured ~12% of device time r3). dconv =
       #    parity-decomposed second decoder conv (full MXU lanes, 37.6 ->
       #    21.8 ms effective floor on the pipeline's biggest FLOP stage).
       #    Experimental rows AFTER the proven ones so a failure can't cost
       #    them; combined row first among the experiments — if it compiles
       #    it should be the new headline.
       #    fbb = fused backbone (fused upsample-convs + decomposed final
       #    conv — kills the 16-lane up1 convs, the backbone's dominant
       #    effective cost).
       #    Measured r4 (first healthy-tunnel window): topk1p@256 = 1740.9
       #    (+7% over pallasp's 1624.4) -> it LEADS group B; fbb was a wash
       #    on device (1616.2, the roofline's lane win didn't materialize);
       #    every dconv program HTTP-500s the remote compile helper
       #    (tpu_compile_helper exit 1, alone and in combos) -> dconv rows
       #    are OFF the ladder (diagnostic rerun lives in the r4 measure
       #    queue, not here, so the driver's budget is never spent on a
       #    known-failing compile).
       #    r5 reorder: the proven 256 row leads (384's r4 official row came
       #    out 2.8x low on a cold transport window — best-of-2 measurement
       #    windows now guard every row, and 384 runs second, on the warm
       #    transport). The superseded fused+pallasp rows moved to
       #    bench_ablate attribution.
       #    pallasg2 = fused gather+attention v2 (in-kernel double-buffered
       #    bank-row DMAs — no XLA gather, no K/t³ swap). Measured r5 queue 3
       #    on one v5e chip: 2018.2 @256, 2043.4 @384 (vs pallasp's
       #    1753.8/1825.3) — it LEADS; pallasp rows stay as proven fallbacks.
       #    flatg (one-take flat gather) measured 1397/1408 — retired.
        ("simple", 256, "fused+pallasg2+topk1p"),
        ("simple", 384, "fused+pallasg2+topk1p"),
       #    cdec (Pallas compact packed decoder) measured r5 queue 6:
       #    1584.7/1572.4/1591.5 @256/384/512 — loses ~22% to pallasg2 but
       #    is the ONLY variant that serves b512 (decoder HLO temps gone);
       #    retired from the ladder, stays an opt-in token (BENCH_NOTES r5).
        ("simple", 384, "fused+pallasp+topk1p"),
        ("chained", 256, "fused+pallasg2+topk1p"),
    ],
]
GROUP_TIMEOUT_S = float(os.environ.get("BENCH_GROUP_TIMEOUT_S", 960))
# Global budget for the WHOLE bench run. The driver killed round 3's run at
# ~25-30 min wall; every internal budget below is derived from the time
# remaining under this, so worst-case internal time can never exceed it.
TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 1380))
_POLL_S = 0.5          # parent tail-poll interval on the streamed result file
_FINAL_RESERVE_S = 10  # kept back so the final emit always happens in-budget
# Smallest remaining budget worth starting a stage with (a fresh remote
# compile needs >=15-65 s healthy); tests shrink it to exercise tiny budgets.
MIN_STAGE_S = float(os.environ.get("BENCH_MIN_STAGE_S", 30))


def _enable_compile_cache():
    """Persistent compilation cache — only when the backend compiles locally
    (remote-compile transports reject serialized-executable caching)."""
    import jax
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
        return
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def flagship_config():
    return {
        "task": "superresolution", "K": 4, "nf": 16, "unet_num_level": 4,
        "layer_order": "gcr", "retrieval_fmaps": 16, "retrieval_num_level": 4,
        "attn_normalize": True, "attn_use_switching": True, "attn_retrieval_mode": True,
        "attn_no_output_mapping": True, "attn_blend": True,
        "attn_patch_extent": 4, "attn_num_patch": 16,
        "retrieval_model": {"network_input": "2+1", "network_target": "16+8",
                            "nf_input": 32, "nf_target": 8, "latent_dim": 64},
        "dataset_train": {"input_chunk_size": 8, "target_chunk_size": 64,
                          "input_mean": 0.3095340441938771, "input_std": 0.14730652990291243,
                          "target_mean": 0.059954833543534335, "target_std": 0.010110036361741626,
                          "voxel_size_input": 0.166667, "voxel_size_target": 0.020834},
    }


def build_params(cfg, compute_dtype):
    import jax
    import jax.numpy as jnp
    from retrieval_fuse_tpu.models import (
        get_retrieval_networks, get_unet_backbone, get_decoder,
        get_retrieval_backbone, get_attention_block)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    fenc_in, _ = get_retrieval_networks(cfg["retrieval_model"])
    unet = get_unet_backbone(cfg)
    dec = get_decoder(cfg)
    rb = get_retrieval_backbone(cfg)
    attn = get_attention_block(cfg, deterministic_selection=True)
    nf, K = cfg["nf"], cfg["K"]
    # param init runs on host CPU: abstract-eval-heavy module inits don't need
    # the accelerator and avoid a pile of remote compiles at benchmark startup
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = None
    import contextlib
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        params = {
            "fenc_input": fenc_in.init(ks[0], jnp.zeros((1, 4, 4, 4, 1)))["params"],
            "unet_backbone": unet.init(ks[1], jnp.zeros((1, 8, 8, 8, 1)))["params"],
            "decoder": dec.init(ks[2], jnp.zeros((1, 32, 32, 32, nf)))["params"],
            "retrieval_backbone": rb.init(ks[3], jnp.zeros((1, 16, 16, 16, 1)))["params"],
            "patched_attention_block": attn.init(
                {"params": ks[4], "gumbel": ks[5]},
                jnp.zeros((1, 32, 32, 32, nf)), jnp.zeros((K, 32, 32, 32, nf)))["params"],
        }
    return params


def build_data(nf, compute_dtype):
    """ShapeNetV2-scale synthetic database: 27,131 train chunks x 64 tiles is
    the REAL deployment bank; for throughput the row values are irrelevant,
    only the (N, D) matmul + (N, 8³·nf) gather shapes matter. Generated ON
    DEVICE — a ~0.5 GB host->device upload is pure noise for a throughput
    benchmark (and chokes relayed/tunneled device transports). The feature
    bank carries random values: its one-time offline precompute is not part
    of serving throughput, and the gather/fold/attention path is
    value-independent in cost."""
    import jax
    import jax.numpy as jnp
    N = 27132
    k1, _, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    db = jax.random.normal(k1, (N, 64), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    feature_bank = jax.random.normal(k3, (N, 8, 8, 8, nf), compute_dtype)
    return db, feature_bank


def build_engine(cfg, params, db, feature_bank, variant, compute_dtype):
    from retrieval_fuse_tpu.inference import RetrieveRefineEngine, variant_engine_kwargs
    return RetrieveRefineEngine(
        cfg, params, db, None, compute_dtype=compute_dtype,
        feature_bank=feature_bank, **variant_engine_kwargs(variant))


def build_flagship(compute_dtype=None, use_pallas_attention: bool = False,
                   use_fused_decoder: bool = False):
    """Single-engine builder kept for interactive use / bench_train imports."""
    import jax.numpy as jnp
    compute_dtype = compute_dtype or jnp.bfloat16
    cfg = flagship_config()
    params = build_params(cfg, compute_dtype)
    db, feature_bank = build_data(cfg["nf"], compute_dtype)
    variant = ("fused" if use_fused_decoder else "") + \
              ("+pallas" if use_pallas_attention else "")
    return build_engine(cfg, params, db, feature_bank, variant or "base", compute_dtype)


def measure(engine, batch_size: int, iters: int = 20) -> float:
    """Throughput with iterations CHAINED through data dependencies: each
    iteration's input is pooled from the previous output, so the device must
    execute them sequentially and one final scalar fetch bounds the whole
    chain — async dispatch / non-blocking block_until_ready (e.g. through
    remote-device tunnels) cannot fake the timing. Only the single pipeline
    step is compiled (no big fori_loop program)."""
    import jax
    import jax.numpy as jnp

    def step(params, database, bank, x):
        # params/database/bank are ARGUMENTS, not closure constants — closure
        # capture would embed the ~0.5 GB bank into the serialized compile
        # payload (remote-compile transports reject it with HTTP 413)
        out = engine._pipeline(params, database, bank, x)
        # 64³ df -> 8³ by mean-pooling to form the next input (cheap, keeps
        # the chained shape equal to the input shape)
        b = x.shape[0]
        return out.reshape(b, 8, 8, 8, 8, 8, 8, 1).mean(axis=(2, 4, 6)) * 8.0

    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.random((batch_size, 8, 8, 8, 1)).astype(np.float32) * 0.5)
    args = (engine.params, engine.database, engine.serving_bank)
    compiled = jax.jit(step).lower(*args, x0).compile()  # AOT: no throwaway run
    print(f"# batch {batch_size}: compiled", file=sys.stderr, flush=True)
    x = compiled(*args, x0)
    float(x[0, 0, 0, 0, 0])  # warm + sync
    # best of two timed windows: a transient transport stall poisons a single
    # window (r4's official 384 row measured 626 where the warm interactive
    # row measured 1776) — the max of two is robust to one bad window
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        x = x0
        for _ in range(iters):
            x = compiled(*args, x)
        float(x[0, 0, 0, 0, 0])  # final fetch bounds the dependent chain
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    return best


def measure_simple(engine, batch_size: int, iters: int = 20) -> float:
    """Plain engine calls on distinct inputs; ONE combined-scalar fetch at the
    end forces completion of every call (a value fetch cannot lie, unlike
    block_until_ready on async transports) while letting calls pipeline —
    which is legitimate serving throughput. Transport RTT is paid once.

    Best of two timed windows (see measure()): one wedged dispatch window
    poisoned r4's official 384 row (626 vs the warm interactive 1776)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((batch_size, 8, 8, 8, 1)).astype(np.float32) * 0.5)
    xs = [x * (1.0 + 1e-3 * i) for i in range(iters)]  # distinct inputs
    out = engine(x)
    float(out[0, 0, 0, 0, 0])  # compile + warm + drain
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        # reduce each output to a device scalar immediately so the big output
        # buffer frees as soon as its execution retires (holding all outputs
        # alive would OOM large batches)
        scalars = [engine(xi)[0, 0, 0, 0, 0] for xi in xs]
        total = jnp.stack(scalars).sum()
        float(total)  # single fetch bounds all executions
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    return best


def _simulate_rows(out_path: str, group: int) -> None:
    """BENCH_SIMULATE mode: write timed fake result rows (no jax, no device)
    so tests can exercise the parent's streaming/kill behavior quickly."""
    step_s = float(os.environ.get("BENCH_SIMULATE_STEP_S", "0.4"))
    with open(out_path, "a") as out:
        for i, (mode, b, variant) in enumerate(LADDER_GROUPS[group]):
            time.sleep(step_s)
            out.write(f"{mode} {b} {variant} {100.0 * (group * 10 + i + 1):.2f}\n")
            out.flush()
    if os.environ.get("BENCH_SIMULATE_HANG") == "1":
        time.sleep(3600)


def _run_ladder(out_path: str, group: int) -> None:
    """Warm-ladder subprocess entry: build shared device data ONCE, then
    measure every entry of LADDER_GROUPS[group] sequentially, appending a
    result line to out_path after EACH measurement (a parent-side kill keeps
    completed rows)."""
    if os.environ.get("BENCH_SIMULATE"):
        _simulate_rows(out_path, group)
        return
    import jax.numpy as jnp
    _enable_compile_cache()
    cfg = flagship_config()
    params = build_params(cfg, jnp.bfloat16)
    db, feature_bank = build_data(cfg["nf"], jnp.bfloat16)
    engines = {}
    with open(out_path, "a") as out:
        for mode, b, variant in LADDER_GROUPS[group]:
            try:
                if variant not in engines:
                    engines[variant] = build_engine(cfg, params, db, feature_bank,
                                                    variant, jnp.bfloat16)
                engine = engines[variant]
                t0 = time.perf_counter()
                if mode == "chained":
                    tput = measure(engine, b, iters=20)
                else:
                    tput = measure_simple(engine, b)
                wall = time.perf_counter() - t0
                print(f"# {mode} b={b} [{variant}]: {tput:.1f} chunks/sec "
                      f"({wall:.0f}s incl. compile)", file=sys.stderr, flush=True)
                out.write(f"{mode} {b} {variant} {tput:.2f} {wall:.1f}\n")
                out.flush()
            except Exception as e:  # noqa: BLE001 — diagnose, keep laddering
                msg = f"{type(e).__name__}: {e}".replace("\n", " | ")
                print(f"# {mode} b={b} [{variant}] FAILED: {msg[:300]}",
                      file=sys.stderr, flush=True)
                out.write(f"# fail {mode} {b} {variant} {msg[:200]}\n")
                out.flush()


def _run_one(mode: str, batch_size: int, variant: str = "base") -> None:
    """Per-entry fallback subprocess: build one engine, run one measurement,
    print the chunks/sec as the last stdout line."""
    if os.environ.get("BENCH_SIMULATE"):
        time.sleep(float(os.environ.get("BENCH_SIMULATE_STEP_S", "0.4")))
        print(f"RESULT {50.0 + batch_size:.2f}", flush=True)
        return
    import jax.numpy as jnp
    _enable_compile_cache()
    cfg = flagship_config()
    params = build_params(cfg, jnp.bfloat16)
    db, feature_bank = build_data(cfg["nf"], jnp.bfloat16)
    engine = build_engine(cfg, params, db, feature_bank, variant, jnp.bfloat16)
    if mode == "chained":
        tput = measure(engine, batch_size, iters=20)
    else:
        tput = measure_simple(engine, batch_size)
    print(f"RESULT {tput:.2f}", flush=True)


def _parse_ladder_results(path):
    import re
    results = []  # (tput, mode, batch, variant, wall_s_incl_compile)
    if not os.path.exists(path):
        return results
    pat = re.compile(
        r"^(simple|chained) (\d+) (\S+) (\d+(?:\.\d+)?)(?: (\d+(?:\.\d+)?))?$")
    with open(path) as f:
        for line in f:
            m = pat.match(line.strip())
            if m:
                results.append((float(m.group(4)), m.group(1), int(m.group(2)),
                                m.group(3),
                                float(m.group(5)) if m.group(5) else -1.0))
    return results


def _emit_best(results) -> None:
    """Print the best-so-far JSON result line. Called after EVERY harvested
    measurement (and once at exit), so an outer SIGKILL at any moment past
    the first completed measurement leaves a valid last line on stdout."""
    best, best_mode, best_b, best_variant, best_wall = max(
        results, default=(0.0, "none", 0, "none", -1.0))
    # The target (BASELINE.md) is 5,000 chunks/sec on a v5e-8. This bench runs
    # on ONE chip; serving is pure data parallelism (batch-sharded, zero
    # cross-chip traffic), so the per-chip share of the target is 5000/8.
    baseline_per_chip = 5000.0 / 8.0
    print(json.dumps({
        "metric": "retrieve_refine_throughput_per_chip",
        "value": round(best, 1),
        "unit": "chunks/sec",
        "vs_baseline": round(best / baseline_per_chip, 4),
        "mode": best_mode, "batch": best_b, "variant": best_variant,
        # wall seconds the row took INCLUDING compile, and the measurement
        # policy — so a degraded-transport row is diagnosable from the JSON
        "row_wall_s": best_wall, "windows": "best_of_2",
    }), flush=True)


# active ladder child + result path, for the SIGTERM handler: an outer
# `timeout`/driver TERMs only the parent, which would orphan the child (it
# keeps holding the TPU tunnel). The handler kills the child, emits the
# best-so-far line once more, and exits cleanly.
_ACTIVE = {"proc": None, "out_path": None}


def _on_terminate(signum, frame):
    del signum, frame
    proc = _ACTIVE.get("proc")
    if proc is not None and proc.poll() is None:
        try:
            proc.kill()
        except OSError:
            pass
    out_path = _ACTIVE.get("out_path")
    if out_path:
        _emit_best(_parse_ladder_results(out_path))
    sys.exit(0)


def _tail_group(here: str, out_path: str, group: int, budget_s: float,
                on_new) -> None:
    """Run one ladder-group subprocess under budget_s, polling the streamed
    result file WHILE it runs and invoking on_new(results) whenever new rows
    land. Child stdout/stderr go to a temp file (never the parent's stdout,
    which carries only JSON result lines + '#' diagnostics on stderr)."""
    import subprocess
    import tempfile

    seen = 0
    # named log file so a human (or a debugging agent) can tail the group's
    # live stderr; removed after the tail is printed
    log_path = out_path + f".group{group}.log"
    with open(log_path, "w+") as log:
        proc = subprocess.Popen(
            [sys.executable, "-u", here, "--ladder", out_path, str(group)],
            stdout=log, stderr=log, text=True)
        _ACTIVE["proc"] = proc
        deadline = time.monotonic() + budget_s
        timed_out = False
        while True:
            rc = proc.poll()
            results = _parse_ladder_results(out_path)
            if len(results) > seen:
                seen = len(results)
                on_new(results)
            if rc is not None:
                break
            if time.monotonic() >= deadline:
                proc.kill()
                proc.wait()
                timed_out = True
                break
            time.sleep(_POLL_S)
        # final harvest: a row can land between the last poll and exit/kill
        results = _parse_ladder_results(out_path)
        if len(results) > seen:
            on_new(results)
        log.seek(0)
        tail = log.read().splitlines()[-10:]
    try:
        os.unlink(log_path)
    except OSError:
        pass
    print("\n".join(tail), file=sys.stderr, flush=True)
    if timed_out:
        print(f"# ladder group {group} timed out after {budget_s:.0f}s; "
              "kept its partial results", file=sys.stderr, flush=True)
    elif proc.returncode != 0:
        print(f"# ladder group {group} rc={proc.returncode}",
              file=sys.stderr, flush=True)


def main():
    """Run the warm ladder in kill-able subprocesses (hung remote-compile
    RPCs block in C calls that in-process signal watchdogs cannot interrupt),
    tailing their streamed results live. Per-entry subprocesses (round-2
    style) remain only as the nothing-measured fallback, smallest program
    first. Every budget derives from the time remaining under
    TOTAL_BUDGET_S; a best-so-far JSON line is (re)printed after every
    harvested measurement."""
    import signal
    import subprocess
    import tempfile

    t_start = time.monotonic()
    signal.signal(signal.SIGTERM, _on_terminate)
    signal.signal(signal.SIGINT, _on_terminate)

    def remaining() -> float:
        return TOTAL_BUDGET_S - _FINAL_RESERVE_S - (time.monotonic() - t_start)

    here = os.path.abspath(__file__)
    fd, out_path = tempfile.mkstemp(prefix="bench_ladder_", suffix=".txt")
    os.close(fd)
    _ACTIVE["out_path"] = out_path
    emitted = [0]

    def on_new(results):
        emitted[0] = len(results)
        _emit_best(results)

    for group in range(len(LADDER_GROUPS)):
        # Group A (proven-fast entries) may use at most ~60% of what's left so
        # a degraded transport that stalls it still leaves the fallback a
        # budget; later groups take what remains.
        frac = 0.6 if group == 0 else 1.0
        budget = min(GROUP_TIMEOUT_S, frac * remaining())
        if budget < MIN_STAGE_S:
            break
        _tail_group(here, out_path, group, budget, on_new)
        if group == 0 and not _parse_ladder_results(out_path):
            print("# group A produced nothing — transport likely degraded; "
                  "skipping experimental group B", file=sys.stderr, flush=True)
            break
    results = _parse_ladder_results(out_path)
    try:
        os.unlink(out_path)
    except OSError:
        pass

    if not results:
        # Fallback: per-entry subprocesses, SMALLEST compile first — in the
        # degraded regime the smallest program is the only one likely to
        # compile inside the remaining budget. Keep measuring (and emitting)
        # while budget remains; best result wins.
        for mode, b, variant in [("simple", 8, "base"), ("simple", 128, "base"),
                                 ("simple", 128, "fused")]:
            budget = min(480.0, remaining())
            if budget < MIN_STAGE_S:
                break
            try:
                proc = subprocess.run([sys.executable, "-u", here, "--one", mode, str(b), variant],
                                      capture_output=True, text=True, timeout=budget)
                result = 0.0
                for line in proc.stdout.splitlines():
                    if line.startswith("RESULT "):
                        result = float(line.split()[1])
                if result <= 0:
                    tail = "; ".join(proc.stderr.splitlines()[-3:])
                    print(f"# {mode} b={b} [{variant}]: no result (rc={proc.returncode}) "
                          f"stderr: {tail[:400]}", file=sys.stderr, flush=True)
                    continue
            except subprocess.TimeoutExpired:
                print(f"# {mode} b={b} [{variant}] timed out", file=sys.stderr, flush=True)
                continue
            print(f"# fallback {mode} b={b} [{variant}]: {result:.1f} chunks/sec",
                  file=sys.stderr, flush=True)
            results.append((result, mode, b, variant, -1.0))
            _emit_best(results)

    _emit_best(results)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ladder":
        _run_ladder(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 0)
    elif len(sys.argv) > 1 and sys.argv[1] == "--one":
        _run_one(sys.argv[2], int(sys.argv[3]),
                 sys.argv[4] if len(sys.argv) > 4 else "base")
    else:
        main()
