#!/usr/bin/env python
"""Offline DH-skeleton inspector.

Replaces the reference's interactive Qt slider tool
(models_Fk_GAN/visual_Fk_DH_byQt.py + main_qt_visual.py): instead of live
sliders, pass joint angles on the command line (or sweep one DOF) and get
rendered PNGs.  Useful for hand-verifying the DH tables exactly like the
reference authors did.

Examples:
    # canonical zero-angle skeleton
    python scripts/visualize_fk.py --out /tmp/fk.png
    # bend the right knee (chain-packed angle index 3) through its range
    python scripts/visualize_fk.py --sweep 3 --out /tmp/knee.png
    # a specific pose
    python scripts/visualize_fk.py --angles 0,0,30,-60,0,... --out /tmp/p.png
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--angles", default="", type=str,
                    help="comma-separated 33 chain-packed angles (deg)")
    ap.add_argument("--sweep", default=-1, type=int,
                    help="sweep this angle index over its traditional range")
    ap.add_argument("--global_rot", default="0,0,0", type=str)
    ap.add_argument("--bone_len", default="", type=str,
                    help="comma-separated 15 bone lengths (default canonical)")
    ap.add_argument("--out", default="fk_pose.png", type=str)
    ap.add_argument("--steps", default=8, type=int)
    ap.add_argument("--jax_platform", default="cpu", type=str)
    args = ap.parse_args(argv)

    import jax
    if args.jax_platform:
        jax.config.update("jax_platforms", args.jax_platform)
    import jax.numpy as jnp
    import numpy as np

    from dhaug_tpu.ops.fk import CANONICAL_BONE_LEN, FKInputs, fk_world_pose
    from dhaug_tpu.utils.viz import plot_pose_grid_3d

    bone_len = np.asarray([float(x) for x in args.bone_len.split(",")]) \
        if args.bone_len else np.asarray(CANONICAL_BONE_LEN)
    grot = np.asarray([float(x) for x in args.global_rot.split(",")])

    if args.sweep >= 0:
        from dhaug_tpu.gan.traditional import TRAD_HI, TRAD_LO, _PACK_34_TO_33
        table_idx = int(_PACK_34_TO_33[args.sweep])
        lo, hi = TRAD_LO[table_idx], TRAD_HI[table_idx]
        sweep = np.linspace(lo, hi, args.steps)
        angles = np.zeros((args.steps, 33), np.float32)
        angles[:, args.sweep] = sweep
        print(f"sweeping chain angle {args.sweep} over [{lo}, {hi}] deg")
    else:
        a = np.zeros(33, np.float32)
        if args.angles:
            vals = [float(x) for x in args.angles.split(",")]
            a[:len(vals)] = vals
        angles = a[None]

    n = angles.shape[0]
    poses = fk_world_pose(FKInputs(
        jnp.asarray(angles),
        jnp.broadcast_to(jnp.asarray(bone_len, jnp.float32), (n, 15)),
        jnp.broadcast_to(jnp.asarray(grot, jnp.float32), (n, 3)),
        jnp.zeros((n, 3), jnp.float32)), n_joints=16)
    path = plot_pose_grid_3d(np.asarray(poses), args.out,
                             title="DH-FK skeleton")
    print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
