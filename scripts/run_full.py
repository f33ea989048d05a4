"""Run the full-scale reference protocol (640x480 x 12 views, run(3)
to fixpoint, level 0) on the TPU with per-phase logging; writes
BENCH_FULL.json on completion. This is bench.py's `full` stage as a
standalone diagnosable run.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_full.py [warm]
"""
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
    from cmvs_pmvs_tpu.utils.options import PMVSOptions
    from cmvs_pmvs_tpu.utils.synthetic import (make_occluded_scene,
                                               write_pmvs_tree)

    root = tempfile.mkdtemp(prefix="run_full_")
    t00 = time.time()

    def log(*a):
        print(f"[{time.time() - t00:8.1f}s]", *a, flush=True)

    try:
        scene = make_occluded_scene(num_cameras=12, width=640,
                                    height=480, focal=700.0)
        write_pmvs_tree(scene, root, mask_border=8)
        with open(os.path.join(root, "option.txt"), "w") as f:
            f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\n"
                    "minImageNum 3\nCPU 4\nsetEdge 0.4\nuseBound 0\n"
                    "useVisData 0\nsequence -1\ntimages -1 0 12\n"
                    "oimages 0\n")
        opt = PMVSOptions.parse(os.path.join(root, "option.txt"))
        data = load_scene(root, opt)
        results = {}
        for passno in ("cold", "warm"):
            t0 = time.time()
            eng = PMVSEngine(data, opt, p_cap=200_000, log=log)
            eng.run(expand_iters=3, max_waves=12, refine_iters=8)
            dt = time.time() - t0
            n = int(np.asarray(eng.cloud.alive).sum())
            phases = {}
            for name, sp in eng.tracer.spans.items():
                top = name.split(".")[0]
                phases[top] = round(phases.get(top, 0.0) + sp.seconds, 2)
            results[passno] = {
                "full_patches": n,
                "full_seconds": round(dt, 1),
                "full_patches_per_sec": round(n / dt, 1),
                "full_phase_seconds": phases,
            }
            log(f"=== {passno}: {n} patches in {dt:.1f}s "
                f"({n / dt:.1f}/s) {phases}")
            cold = results.get("cold", {})
            out = {"timestamp": time.strftime("%F %T"),
                   "protocol": "640x480 x 12 views, level 0, csize 2, "
                               "run(3) expand to fixpoint, 8-iter "
                               "refine, p_cap 200k",
                   "full_patches": cold.get("full_patches"),
                   "full_cold_seconds": cold.get("full_seconds"),
                   "full_cold_phase_seconds":
                       cold.get("full_phase_seconds"),
                   }
            if "warm" in results:
                # bench.py convention: full_seconds = the steady pass
                out["full_steady"] = True
                out["full_seconds"] = results["warm"]["full_seconds"]
                out["full_patches_per_sec"] = \
                    results["warm"]["full_patches_per_sec"]
                out["full_phase_seconds"] = \
                    results["warm"]["full_phase_seconds"]
            with open(os.path.join(HERE, "BENCH_FULL.json"), "w") as f:
                json.dump(out, f, indent=1)
            if len(sys.argv) > 1 and sys.argv[1] == "coldonly":
                break
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
