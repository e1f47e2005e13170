"""Multi-chip scaling model for the dof-partitioned halo step.

VERDICT round-4 weak item 6: the dist/ layer is correctness-tested on an
8-virtual-device CPU mesh, but nothing quantifies whether multi-chip
actually closes the ~1M-DOF throughput gap. This script computes the
EXACT communication volumes from the real partition maps (dist/halo.py
HaloMaps over the production supernode layout) at a given mesh size and
combines them with v5e hardware constants and the measured single-chip
step economics into a projected steps/s per shard count.

The model (per time step, developed regime):
  t_step(S) = t_compute_1chip / S                    [bandwidth-bound
              work splits with the rows: matvec + Schwarz PC are local]
            + n_exch(S) * (recv_bytes(S) / ICI_BW + LAT_COLLECTIVE)
            + n_dots * LAT_COLLECTIVE                [psum latency]
  n_exch = ksp/step (one FORWARD halo exchange per outer matvec; the
  PC is per-shard additive Schwarz with halo columns dropped, so PC
  applies need no exchange — dist/halo.py local_cols_pc).
A Schwarz-quality sensitivity arm inflates ksp/step by +30% (the
iteration growth budget the 8-shard equivalence tests allow).

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/multichip_model.py \
      [res_scale] [t_1chip_step_s] [ksp_per_step] [S1,S2,...]

Defaults are the round-5 measured 106k numbers (r5_106k_dev: 1.1514
steps/s, 9.5 ksp/step).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# TPU v5e public constants (How to Scale Your Model, ch. TPUs):
HBM_GBPS = 819.0          # HBM bandwidth per chip
ICI_GBPS = 90.0           # effective per-chip ICI all-gather bandwidth
                          # (v5e 2D torus, ~1600 Gbps/chip raw bidir;
                          # derated for protocol + ring efficiency)
LAT_COLLECTIVE = 5e-6     # per-collective launch+hop latency (s)
N_DOTS_PER_ITER = 2       # psum'd dot products per outer iteration


def main():
    import os

    res_scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    t1 = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0 / 1.1514
    ksp = float(sys.argv[3]) if len(sys.argv) > 3 else 9.5
    shards = (
        [int(x) for x in sys.argv[4].split(",")]
        if len(sys.argv) > 4 else [1, 2, 4, 8, 16]
    )

    os.environ["BENCH_RES_SCALE"] = str(res_scale)
    from bench import _dfg_scenario
    from cfdtpu.dist.halo import HaloMaps

    sc = _dfg_scenario()
    s = sc.solver
    bsr = s._nodebsr
    ndofs = s.V.num_global_dofs + s.Q.num_global_dofs
    sup = bsr._sup
    itemsize = 4  # f32 values on TPU
    vals_bytes = sup.ns * sup.Kg * (bsr.g * bsr.bs) ** 2 * itemsize
    print(f"dofs={ndofs} supernodes={sup.ns} Kg={sup.Kg} "
          f"gbs={bsr.g * bsr.bs} vals={vals_bytes/1e6:.0f} MB "
          f"t_1chip={t1:.3f} s/step ksp/step={ksp:.1f}")
    print(f"{'S':>3} {'L':>7} {'H':>6} {'B':>6} {'halo%':>6} "
          f"{'recv/exch':>10} {'t_comm':>8} {'t_comp':>8} "
          f"{'steps/s':>8} {'steps/s(+30%its)':>16} {'eff':>5}")
    w = bsr.g * bsr.bs
    rows = []
    for S in shards:
        if S == 1:
            t_comm = 0.0
            t_comp = t1
            v = 1.0 / t1
            rows.append((S, sup.ns, 0, 0, 0.0, 0, 0.0, t_comp, v, v, 1.0))
            continue
        maps = HaloMaps(bsr, S)
        # each shard receives the full gathered pack minus its own part
        recv = (S - 1) * maps.B * w * itemsize
        t_exch = recv / (ICI_GBPS * 1e9) + LAT_COLLECTIVE
        t_comm = ksp * (t_exch + N_DOTS_PER_ITER * LAT_COLLECTIVE)
        t_comp = t1 / S
        t_step = t_comp + t_comm
        t_step_sens = t_comp + 1.3 * t_comm + 0.3 * (t1 * 0.8) / S
        halo_frac = maps.H / max(maps.L, 1)
        rows.append((
            S, maps.L, maps.H, maps.B, 100 * halo_frac, recv,
            t_comm, t_comp, 1 / t_step, 1 / t_step_sens,
            (1 / t_step) / (S / t1),
        ))
    for r in rows:
        print(f"{r[0]:>3} {r[1]:>7} {r[2]:>6} {r[3]:>6} {r[4]:>6.1f} "
              f"{r[5]/1e6:>8.2f}MB {r[6]*1e3:>6.1f}ms {r[7]*1e3:>6.1f}ms "
              f"{r[8]:>8.2f} {r[9]:>16.2f} {r[10]:>5.2f}")


if __name__ == "__main__":
    main()
