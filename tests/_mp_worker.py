"""Subprocess worker for the multi-process tests (tests/test_multiprocess.py).

Modes:
  clusters <prefix> <process_id> <process_count>
      run this process's round-robin share of the cluster option files
      (the pmvs.sh replacement, parallel/clusters.py) - no JAX
      distributed runtime needed, the filesystem is the only medium,
      exactly like the reference's one-pmvs2-per-cluster shell script
      (reference source/genOption.cpp:58-74).
  gspmd <prefix> <process_id> <process_count> <coord_addr> <out_path>
      initialize jax.distributed (CPU/gloo), build a global `patch` mesh
      spanning both processes' virtual devices, and run the GSPMD engine
      end-to-end; process 0 writes "<patches>" to out_path.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_NDEV = int(os.environ.get("MP_DEVICES", "4"))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={_NDEV}")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    mode = sys.argv[1]
    prefix = sys.argv[2]
    pid = int(sys.argv[3])
    pcount = int(sys.argv[4])

    if mode == "clusters":
        from cmvs_pmvs_tpu.parallel.clusters import run_clusters
        runs = run_clusters(prefix, process_index=pid,
                            process_count=pcount, p_cap=8192,
                            checkpoint=True, log=lambda *a: None,
                            expand_iters=1, max_waves=1, refine_iters=4)
        print(f"[proc {pid}] " + " ".join(
            f"{r.name}:{r.patches}" for r in runs), flush=True)
        return

    if mode == "gspmd":
        coord = sys.argv[5]
        out_path = sys.argv[6]
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=pcount, process_id=pid)
        from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
        from cmvs_pmvs_tpu.parallel.engine_shard import make_engine_mesh
        from cmvs_pmvs_tpu.utils.options import PMVSOptions
        opt = PMVSOptions.parse(os.path.join(prefix, "option.txt"))
        scene = load_scene(prefix, opt)
        mesh = make_engine_mesh()        # all global devices
        assert len(jax.devices()) == _NDEV * pcount, len(jax.devices())
        eng = PMVSEngine(scene, opt, p_cap=4096, mesh=mesh,
                         log=lambda *a: None)
        eng.run(expand_iters=1, max_waves=1, refine_iters=4)
        n = int(eng.cloud.count())
        if pid == 0:
            with open(out_path, "w") as f:
                f.write(str(n))
        print(f"[proc {pid}] patches={n}", flush=True)
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
