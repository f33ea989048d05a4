"""Per-chip benchmark: hot-kernel throughput + end-to-end pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with an
"extra" dict carrying end-to-end numbers (steady-state reconstruction
patches/s and per-phase seconds on an occluded multi-object scene).

Headline metric: full Levenberg-Marquardt patch refinements per second -
each refinement runs `NUM_ITERS` LM iterations alternating full 4-probe
fan evaluations with candidate-only evaluations under Broyden Jacobian
reuse (ops/refine.BROYDEN_REFRESH; 24 objective evaluations per
8-iteration refinement, each a 6-view x wsize^2 x RGB bilinear window
grab + NCC), matching the work profile of the reference's per-patch
BOBYQA solve (SURVEY.md 3.4). NUM_ITERS=8 is the engine default;
convergence on the bench scene: median plane offset 0.187 dscale at 8
iterations (the pre-Broyden all-full schedule reached 0.135 at the
same iteration count but 1.5x the evaluations; 12 Broyden iterations
reach 0.140 at the all-full-8 cost - both operating points sit far
inside the 0.5-unit visibility/filter tolerances, measured 2026-08-21).

vs_baseline: MEASURED via native/cpu_baseline.cpp - a C++ microbench of
the reference hot-loop work profile (my_f -> grabTex -> normalize -> dot,
reference optim.cpp:507-578/815-863/1031-1088) compiled -O3
-march=native and run on this host. Measured 193k objective evals/s per
Xeon core (2026-08, see BASELINE.md provenance); a 16-core box then
sustains ~3.09M evals/s, and at the reference's typical ~100 BOBYQA
evaluations per converged patch that is ~30.9k patch refinements/s.
The microbench is deliberately generous to the CPU (always-in-bounds
windows, cache-resident pyramid, no queue/locks/organizer overhead), so
this divisor is an upper bound on real 16-core PMVS2 throughput. When
the binary is present (native/build.sh) the divisor is re-measured on
the bench host instead of using the recorded constant.
"""
import json
import os
import re
import shutil
import subprocess
import tempfile
import time
import traceback

import numpy as np

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*[A-Za-z]|\x1b\].*?(\x07|\x1b\\\\)")


def _short_error(exc: BaseException, stage: str) -> str:
    """Compact, escape-free error string safe for the parsed JSON line;
    the full traceback goes to bench_errors.log (VERDICT r3: a 1500-char
    ANSI-mangled error made the driver's parsed field null and lost the
    round's headline metric)."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_errors.log"), "a") as f:
            f.write(f"\n=== {stage} @ {time.strftime('%F %T')} ===\n")
            f.write("".join(traceback.format_exception(exc)))
    except Exception:
        pass
    msg = f"{type(exc).__name__}: {exc}"
    msg = _ANSI_RE.sub("", msg)
    msg = "".join(c if c.isprintable() else " " for c in msg)
    return msg[:200]

# recorded fallback: 193,092 evals/s/core x 16 cores / 100 evals per
# BOBYQA-converged patch (see module docstring + BASELINE.md)
BASELINE_PATCHES_PER_SEC = 30895.0
BASELINE_CORES = 16
BOBYQA_EVALS_PER_PATCH = 100.0
BASELINE_EVALS_PER_SEC = 193092.0 * BASELINE_CORES
BATCH = 8192
NUM_ITERS = 8
# objective evaluations per refinement at the engine schedule (8 LM
# iterations, BROYDEN_REFRESH=2): initial 4-probe fan + 4 full fans +
# 4 candidate-only evals = 24 (see ops/refine.BROYDEN_REFRESH)
EVALS_PER_REFINEMENT = 24.0


def _write_json(path, obj):
    """Persist a stage result the moment it exists (VERDICT r4: the
    full-scale number lived only in a commit message because the
    driver killed bench.py before the final print)."""
    try:
        import os
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, path)
    except Exception:
        pass


def enable_compile_cache():
    """Persistent XLA compilation cache: first-compile of each engine
    phase costs minutes through the remote TPU compile helper; cached
    reloads take ~1 s (measured 12.1 s -> 1.1 s on this chip)."""
    import jax
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def measure_baseline() -> float:
    """Re-measure the 16-core CPU divisor on this host via the
    cpu_baseline microbench (single-core evals/s x 16 / 100)."""
    exe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "native", "cpu_baseline")
    if not os.path.exists(exe):
        return BASELINE_PATCHES_PER_SEC
    try:
        out = subprocess.run([exe, "1", "4"], capture_output=True,
                             text=True, timeout=60, check=True)
        eps = float(json.loads(out.stdout)["evals_per_sec"])
        # floor at the recorded uncontended measurement: a busy bench
        # host must not shrink the CPU divisor (generous-to-CPU rule)
        return max(eps * BASELINE_CORES / BOBYQA_EVALS_PER_PATCH,
                   BASELINE_PATCHES_PER_SEC)
    except Exception:
        return BASELINE_PATCHES_PER_SEC


def bench_kernel():
    import jax
    import jax.numpy as jnp
    from cmvs_pmvs_tpu.geom import build_camera_set
    from cmvs_pmvs_tpu.image import build_pyramids
    from cmvs_pmvs_tpu.ops.refine import (
        _pallas_enabled, make_problem, refine_patches, set_scales,
    )
    from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene

    scene = make_plane_scene(num_cameras=6, width=640, height=480,
                             focal=800.0)
    cams = build_camera_set(scene.P, dtype=jnp.float32)
    pyr = build_pyramids(list(scene.images), None, num_levels=3)
    if _pallas_enabled():
        from cmvs_pmvs_tpu.image.pyramid import with_tiles
        pyr = with_tiles(pyr)

    rng = np.random.default_rng(0)
    C = scene.centers[0]
    P = scene.P[0]
    us = rng.uniform(120, 520, BATCH)
    vs = rng.uniform(90, 390, BATCH)
    X1 = np.linalg.solve(
        P[:, :3], (np.stack([us, vs, np.ones(BATCH)], 0)
                   - P[:, 3:4])).T
    d = X1 - C
    s = -(C @ scene.plane_n) / (d @ scene.plane_n)
    pts = C + s[:, None] * d

    coord = jnp.asarray(np.concatenate([pts, np.ones((BATCH, 1))], 1),
                        jnp.float32)
    normal = jnp.asarray(np.tile(np.append(scene.plane_n, 0.0),
                                 (BATCH, 1)), jnp.float32)
    views = jnp.tile(jnp.arange(6, dtype=jnp.int32)[None], (BATCH, 1))
    valid = jnp.ones((BATCH, 6), bool)
    dscale, _ = set_scales(cams, 0, 7, coord, views, valid)

    # perturb so the solver does real work
    ray = coord - cams.center[jnp.zeros(BATCH, jnp.int32)]
    ray = ray / jnp.linalg.norm(ray[:, :3], axis=1, keepdims=True)
    noise = jnp.asarray(rng.uniform(-2, 2, BATCH)[:, None], jnp.float32)
    coord0 = coord + noise * dscale[:, None] * ray

    prob = make_problem(cams, 0, coord0, normal, views, valid, dscale, 3)

    NWAVE = 4

    @jax.jit
    def waves(coord, normal):
        # NWAVE chained refinements in one program: amortizes the
        # per-dispatch latency of this environment's remote-TPU tunnel
        # (~25 ms/call), which is not part of the chip's work; the
        # engine likewise runs many waves per dispatched phase
        def body(carry, _):
            c, n = carry
            c2, n2, ncc = refine_patches(cams, pyr, 0, 7, prob, c, n,
                                         num_iters=NUM_ITERS,
                                         with_ncc=True)[:3]
            return (c2, n2), ncc
        (c, n), nccs = jax.lax.scan(body, (coord, normal), None,
                                    length=NWAVE)
        return c, n, nccs

    out = waves(coord0, normal)       # compile + warmup
    float(np.asarray(out[2]).sum())

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = waves(coord0, normal)
        # scalar readback: provably synchronizes through the axon
        # tunnel, where block_until_ready has been observed returning
        # early (a 2026-08-21 run timed 74 us for 4 waves - physically
        # impossible - and the same program timed 337 ms with a scalar
        # readback; all scripts/ benches use the same pattern)
        float(out[2].sum())
        times.append(time.perf_counter() - t0)
    return BATCH * NWAVE / min(times)


def _bench_scene(tag: str, num_cameras: int, width: int, height: int,
                 focal: float, option: str, run_kwargs: dict,
                 budget_s: float, p_cap: int = 30000,
                 mask_border: int = 0):
    """Compile-run then steady-run one reconstruction config; returns a
    {tag}_* stats dict (BASELINE.md: "reconstruction wall-clock ... at
    equal completeness")."""
    from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
    from cmvs_pmvs_tpu.utils.options import PMVSOptions
    from cmvs_pmvs_tpu.utils.synthetic import (
        make_occluded_scene, write_pmvs_tree)

    root = tempfile.mkdtemp(prefix=f"bench_{tag}_")
    try:
        scene = make_occluded_scene(num_cameras=num_cameras, width=width,
                                    height=height, focal=focal)
        write_pmvs_tree(scene, root, mask_border=mask_border)
        opt_path = os.path.join(root, "option.txt")
        with open(opt_path, "w") as f:
            f.write(option)
        opt = PMVSOptions.parse(opt_path)
        data = load_scene(root, opt)

        t0 = time.time()
        eng = PMVSEngine(data, opt, p_cap=p_cap, log=lambda *a: None)
        eng.run(**run_kwargs)
        compile_run = time.time() - t0
        if time.time() - t0 > budget_s:
            # no time for a clean steady-state pass; report the cold run
            n = int(np.asarray(eng.cloud.alive).sum())
            return {f"{tag}_patches": n,
                    f"{tag}_seconds": round(compile_run, 1),
                    f"{tag}_steady": False}

        t1 = time.time()
        eng2 = PMVSEngine(data, opt, p_cap=p_cap, log=lambda *a: None)
        eng2.run(**run_kwargs)
        steady = time.time() - t1
        n = int(np.asarray(eng2.cloud.alive).sum())
        phases = {}
        for name, sp in eng2.tracer.spans.items():
            top = name.split(".")[0]
            phases[top] = round(phases.get(top, 0.0) + sp.seconds, 2)
        return {f"{tag}_patches": n, f"{tag}_seconds": round(steady, 1),
                f"{tag}_patches_per_sec": round(n / steady, 1),
                f"{tag}_steady": True, f"{tag}_phase_seconds": phases}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_e2e(budget_s: float = 420.0):
    """Truncated-protocol scene (comparable with BENCH_r01/r02)."""
    return _bench_scene(
        "e2e", 8, 192, 144, 300.0,
        "level 0\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
        "CPU 4\nsetEdge 0\nuseBound 0\nuseVisData 0\nsequence -1\n"
        "timages -1 0 8\noimages 0\n",
        dict(expand_iters=1, max_waves=2, refine_iters=8), budget_s)


def bench_e2e_full(budget_s: float = 420.0):
    """The reference run protocol at scale (VERDICT r2 item 3): 640x480,
    12 views, masks + setEdge, run(3) with waves to fixpoint, level 0
    (the reference default level 1 variant runs in tests; level 0 is the
    perf-relevant depth)."""
    return _bench_scene(
        "full", 12, 640, 480, 700.0,
        "level 0\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
        "CPU 4\nsetEdge 0.4\nuseBound 0\nuseVisData 0\nsequence -1\n"
        "timages -1 0 12\noimages 0\n",
        dict(expand_iters=3, max_waves=12, refine_iters=8), budget_s,
        p_cap=200_000, mask_border=8)


def _launch_scaling():
    """Start scripts/scaling_curve.py on the host CPU, non-blocking
    (its own JAX_PLATFORMS=cpu process; VERDICT r3 item 6)."""
    import sys
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "scaling_curve.py")
    try:
        return subprocess.Popen([sys.executable, script],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)
    except Exception as e:
        _short_error(e, "scaling-launch")
        return None


def _collect_scaling(proc, timeout_s: float = 480.0):
    """Join the scaling subprocess; persist its curve to
    docs/scaling_latest.json (a committed artifact, VERDICT r4 item 5)
    and return it for the bench line."""
    try:
        out, _ = proc.communicate(timeout=timeout_s)
        for ln in reversed(out.strip().splitlines()):
            try:
                res = json.loads(ln)
                _write_json(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "docs", "scaling_latest.json"),
                    {"timestamp": time.strftime("%F %T"), **res})
                return res
            except ValueError:
                continue
        return {"scaling_error": "no JSON line in output"}
    except Exception as e:
        try:
            proc.kill()
        except Exception:
            pass
        return {"scaling_error": _short_error(e, "scaling")}


def bench_scaling(timeout_s: float = 480.0):
    """Blocking wrapper kept for direct use."""
    proc = _launch_scaling()
    if proc is None:
        return {"scaling_error": "launch failed"}
    return _collect_scaling(proc, timeout_s)


def main():
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    enable_compile_cache()
    baseline = measure_baseline()
    t_start = time.time()
    pps = bench_kernel()
    # both accounting bases (VERDICT r4 weak 4): the refinement basis
    # credits the Broyden schedule's algorithmic win (24 evals/patch vs
    # BOBYQA's ~100); the equal-work basis divides raw objective
    # evals/s by the measured 16-core CPU eval rate
    line = {
        "metric": "patch_refinements_per_sec_per_chip",
        "value": round(pps, 1),
        "unit": "patches/s",
        "vs_baseline": round(pps / baseline, 2),
        "vs_baseline_equal_work": round(
            pps * EVALS_PER_REFINEMENT / BASELINE_EVALS_PER_SEC, 3),
        "baseline_patches_per_sec_16core": round(baseline, 1),
    }
    # emit the headline immediately so a driver timeout during the
    # (compile-heavy) e2e stage cannot lose it; the final line repeats
    # it with the e2e numbers attached
    print(json.dumps(line), flush=True)
    _write_json(os.path.join(here, "BENCH_PARTIAL.json"), line)
    if os.environ.get("BENCH_SKIP_E2E"):
        return
    # the GSPMD scaling curve runs on the host CPU (its own
    # JAX_PLATFORMS=cpu subprocess), so it can run CONCURRENTLY with
    # the TPU stages - round 4 ran it last and the driver timeout
    # during the full stage lost it (VERDICT r4 weak 5)
    scaling_proc = None
    if not os.environ.get("BENCH_SKIP_SCALING"):
        scaling_proc = _launch_scaling()
    extra = {}
    try:
        extra = bench_e2e()
    except Exception as e:       # never lose the headline metric
        extra = {"e2e_error": _short_error(e, "e2e")}
    print(json.dumps({**line, "extra": extra}), flush=True)
    _write_json(os.path.join(here, "BENCH_PARTIAL.json"),
                {**line, "extra": extra})
    # full reference protocol at scale. A live run needs ~35 min of
    # trace+lower alone in a fresh process (the TPU work is ~211 s
    # warm), which no driver window fits - so by default the committed
    # steady-state artifact (BENCH_FULL.json, produced by
    # scripts/run_full.py on this chip) is referenced instead, per the
    # round-4 verdict's accepted evidence path. Set BENCH_LIVE_FULL=1
    # to force a live run.
    remaining = 1500.0 - (time.time() - t_start)
    if not os.environ.get("BENCH_SKIP_FULL"):
        full = {}
        artifact = os.path.join(here, "BENCH_FULL.json")
        if os.environ.get("BENCH_LIVE_FULL") and remaining > 180.0:
            try:
                full = bench_e2e_full(budget_s=remaining - 60.0)
                # never clobber a committed STEADY artifact with a
                # cold-only (budget-truncated) record
                steady_exists = False
                try:
                    with open(artifact) as f:
                        steady_exists = json.load(f).get("full_steady",
                                                         False)
                except Exception:
                    pass
                if full.get("full_steady") or not steady_exists:
                    _write_json(artifact,
                                {"timestamp": time.strftime("%F %T"),
                                 **full})
            except Exception as e:
                extra["full_error"] = _short_error(e, "full")
        else:
            try:
                with open(artifact) as f:
                    rec = json.load(f)
                if rec.get("full_steady"):
                    full = {k: v for k, v in rec.items()
                            if k.startswith("full_")}
                    full["full_source"] = (
                        f"committed BENCH_FULL.json artifact, "
                        f"measured {rec.get('timestamp')} by "
                        f"scripts/run_full.py on this chip")
            except Exception as e:
                extra["full_error"] = _short_error(e, "full-artifact")
        extra.update(full)
        print(json.dumps({**line, "extra": extra}), flush=True)
        _write_json(os.path.join(here, "BENCH_PARTIAL.json"),
                    {**line, "extra": extra})
    if scaling_proc is not None:
        extra.update(_collect_scaling(
            scaling_proc, timeout_s=max(30.0,
                                        1680.0 - (time.time() - t_start))))
        print(json.dumps({**line, "extra": extra}), flush=True)
        _write_json(os.path.join(here, "BENCH_PARTIAL.json"),
                    {**line, "extra": extra})


if __name__ == "__main__":
    main()
