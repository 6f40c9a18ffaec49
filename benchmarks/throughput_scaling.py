"""Decoded-samples/s scaling: 1 device -> N devices -> N processes.

Closes BASELINE.json's "decoded-samples/s scaling measured at 1 chip,
1 host, and N>=2 hosts" clause to the extent this environment allows:

  * single REAL chip throughput comes from bench.py / BENCH_r{N}.json
    (AMP iterations/s and decoded info bits/s on the TPU v5e) — this
    script records the emulated rows that sit on top of it;
  * device scaling (1 host): the dp-sharded Monte-Carlo on the virtual
    8-device CPU mesh, WEAK scaling (constant per-device trial count) —
    the shard_map program is byte-identical to the multi-chip TPU one
    (same psum pattern; see multichip_scaling.json for the collective
    counts), only the per-device compute speed differs;
  * process scaling (N>=2 "hosts"): the same program under
    `jax.distributed` across separate OS processes, where the final psum
    crosses the process boundary over the distributed runtime — the DCN
    analogue of a multi-host pod.

All rows are labeled emulated=true except the bench reference. Writes
docs/artifacts/throughput_scaling.json.

Usage: python benchmarks/throughput_scaling.py           # both parts
       python benchmarks/throughput_scaling.py --worker N ... (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# per-device trial count (weak scaling) and the shared model config
TRIALS_PER_DEV = 32
CFG = dict(P=15.0, R=1.3, L=256, M=32)
T_MAX = 15


def _setup_cpu(n_local_devices: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") +
        f" --xla_force_host_platform_device_count={n_local_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    return jax


def _run_counts(mesh, n_trials: int):
    from ldpc_sparc_tpu.config import SparcParams, DecodeParams
    from ldpc_sparc_tpu.parallel.montecarlo import sparc_mc_counts
    params = SparcParams(**CFG)
    dec = DecodeParams(t_max=T_MAX)

    def run():
        return sparc_mc_counts(params, dec, 1.0, seed=0,
                               n_trials=n_trials, mesh=mesh)

    counts = run()                      # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        counts = run()
    dt = (time.perf_counter() - t0) / reps
    return counts, dt


def device_scaling():
    jax = _setup_cpu(8)
    from ldpc_sparc_tpu.parallel.mesh import make_mesh
    rows = []
    for ndev in (1, 2, 4, 8):
        mesh = jax.make_mesh((ndev, 1), ("dp", "sec"),
                             devices=jax.devices()[:ndev])
        n_trials = TRIALS_PER_DEV * ndev
        counts, dt = _run_counts(mesh, n_trials)
        rows.append({"devices": ndev, "processes": 1,
                     "trials": n_trials,
                     "samples_per_s": round(n_trials / dt, 1),
                     "per_device_samples_per_s":
                         round(n_trials / dt / ndev, 1),
                     "bit_errs": counts["bit_errs"], "emulated": True})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def worker(nprocs: int, pid: int, port: int):
    jax = _setup_cpu(2)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    from ldpc_sparc_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(sec=1)
    n_dev = len(jax.devices())
    n_trials = TRIALS_PER_DEV * n_dev
    counts, dt = _run_counts(mesh, n_trials)
    if pid == 0:
        print(json.dumps({
            "devices": n_dev, "processes": nprocs, "trials": n_trials,
            "samples_per_s": round(n_trials / dt, 1),
            "per_device_samples_per_s": round(n_trials / dt / n_dev, 1),
            "bit_errs": counts["bit_errs"], "emulated": True,
            "transport": "jax.distributed (cross-process psum, "
                         "DCN analogue)"}), flush=True)


def process_scaling(port: int):
    rows = []
    for nprocs in (1, 2):
        procs = [subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid),
             "--nprocs", str(nprocs), "--port", str(port + nprocs)],
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, text=True)
            for pid in range(nprocs)]
        out0 = procs[0].communicate(timeout=900)[0]
        codes = [p.wait(timeout=900) for p in procs]
        assert all(c == 0 for c in codes), (codes, out0)
        row = json.loads([l for l in out0.splitlines()
                          if l.startswith("{")][-1])
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=19610)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.nprocs, args.worker, args.port)
        return

    dev_rows = device_scaling()
    proc_rows = process_scaling(args.port)
    result = {
        "config": f"plain SPARC {CFG}, t_max={T_MAX}, weak scaling "
                  f"({TRIALS_PER_DEV} trials/device)",
        "note": "virtual CPU devices — the shard_map/psum program is the "
                "same one a TPU mesh runs (multichip_scaling.json has its "
                "collective counts); per-device absolute speed is NOT "
                "TPU-relevant. Real single-chip throughput: see "
                "BENCH_r{N}.json (AMP iterations/s on the TPU v5e).",
        "device_rows": dev_rows,
        "process_rows": proc_rows,
    }
    out_path = Path(__file__).resolve().parent.parent / "docs" / \
        "artifacts" / "throughput_scaling.json"
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    # weak-scaling sanity: 8-device throughput should be well above 1-device
    r1 = dev_rows[0]["samples_per_s"]
    r8 = dev_rows[-1]["samples_per_s"]
    print(json.dumps({"scaling_8_over_1": round(r8 / r1, 2)}))


if __name__ == "__main__":
    main()
