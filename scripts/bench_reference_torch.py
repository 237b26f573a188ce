#!/usr/bin/env python
"""Reference-style PyTorch baseline for the augmented-pose synthesis rate.

Implements the reference's computational pattern from scratch (NOT copied):
a dense generator trunk (Linear+ReLU prelude, three 2-Linear residual
blocks, 35-dim head) followed by the DH forward-kinematics evaluation as the
reference structures it — per-link 4x4 matrices built by indexed assignment
(forward_kinematics_DH_model.py:80-116) and *sequential* batched matmuls
down each chain with cloned intermediates (:659-677), then camera projection.
This is the per-batch work of one fake-pose synthesis in
GAN_solutions_FK_generator.

Run on CPU (no CUDA in this image) to produce the poses/sec baseline that
bench.py compares against.  The reference itself ran single-GPU and never
measured throughput (SURVEY.md §6), so this same-machine torch measurement
is the reproducible stand-in.
"""
import argparse
import time

import numpy as np
import torch
import torch.nn as nn

DEG = np.pi / 180.0


class ResBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim)
        self.fc2 = nn.Linear(dim, dim)
        self.relu = nn.ReLU(True)

    def forward(self, x):
        y = self.relu(self.fc1(x))
        y = self.fc2(y)
        return self.relu(y + x)


class Trunk(nn.Module):
    def __init__(self, dense=1000, out=35):
        super().__init__()
        self.pre = nn.Sequential(nn.Linear(128, dense), nn.ReLU(True))
        self.b1, self.b2, self.b3 = ResBlock(dense), ResBlock(dense), ResBlock(dense)
        self.head = nn.Linear(dense, out)

    def forward(self, z):
        x = self.pre(z)
        x = self.b3(self.b2(self.b1(x)))
        return self.head(x)


def dh_matrix_batch(alpha_deg, a, d, theta_deg):
    """(B,) tensors -> (B, 4, 4) via indexed assignment, reference-style."""
    B = theta_deg.shape[0]
    al = alpha_deg * DEG
    th = theta_deg * DEG
    m = torch.zeros((B, 4, 4))
    m[:, 0, 0] = torch.cos(th)
    m[:, 0, 1] = -torch.sin(th)
    m[:, 0, 3] = a
    m[:, 1, 0] = torch.sin(th) * torch.cos(al)
    m[:, 1, 1] = torch.cos(th) * torch.cos(al)
    m[:, 1, 2] = -torch.sin(al)
    m[:, 1, 3] = -torch.sin(al) * d
    m[:, 2, 0] = torch.sin(th) * torch.sin(al)
    m[:, 2, 1] = torch.cos(th) * torch.sin(al)
    m[:, 2, 2] = torch.cos(al)
    m[:, 2, 3] = torch.cos(al) * d
    m[:, 3, 3] = 1.0
    return m


CHAINS = {
    "right_leg": dict(alpha=[0, -90, -90, 0, 0], theta=[0, -90, 180, 0, 0]),
    "left_leg": dict(alpha=[0, 90, 90, 0, 0], theta=[180, -90, 0, 0, 0]),
    "body": dict(alpha=[0] + [-90] * 11 + [90],
                 theta=[90] + [-90] * 10 + [0, 0]),
    "right_hand": dict(alpha=[-90, -90, -90, 0, 0], theta=[-180, -90, 180, 0, 0]),
    "left_hand": dict(alpha=[-90, 90, 90, 0, 0], theta=[0, -90, 0, 0, 0]),
}


def fk_reference_style(angles33, bone_len, B):
    """Sequential per-chain cumulative bmm, as the reference does."""
    ones = torch.ones(B)
    zeros = torch.zeros(B)

    def chain_mats(name, n, ang, a_cols, d_cols):
        spec = CHAINS[name]
        mats = []
        for i in range(n):
            mats.append(dh_matrix_batch(
                torch.full((B,), float(spec["alpha"][i])),
                a_cols[i], d_cols[i],
                torch.full((B,), float(spec["theta"][i])) + ang[:, i]))
        return mats

    bl = bone_len
    rl_a = [bl[:, 5], zeros, zeros, bl[:, 3], bl[:, 1]]
    ll_a = [-bl[:, 4], zeros, zeros, bl[:, 2], bl[:, 0]]
    body_a = [zeros] * 12 + [bl[:, 14]]
    body_d = [zeros, zeros, zeros, bl[:, 6], zeros, zeros, bl[:, 7]] + [zeros] * 6
    rh_a = [-bl[:, 9], zeros, zeros, bl[:, 11], bl[:, 13]]
    lh_a = [bl[:, 8], zeros, zeros, bl[:, 10], bl[:, 12]]
    z5 = [zeros] * 5

    chains = {
        "right_leg": chain_mats("right_leg", 5, angles33[:, 0:5], rl_a, z5),
        "left_leg": chain_mats("left_leg", 5, angles33[:, 5:10], ll_a, z5),
        "body": chain_mats("body", 13, angles33[:, 10:23], body_a, body_d),
        "right_hand": chain_mats("right_hand", 5, angles33[:, 23:28], rh_a, z5),
        "left_hand": chain_mats("left_hand", 5, angles33[:, 28:33], lh_a, z5),
    }
    # arm chains prefixed with the first 9 body links
    chains["right_hand"] = [m.clone() for m in chains["body"][:9]] + chains["right_hand"]
    chains["left_hand"] = [m.clone() for m in chains["body"][:9]] + chains["left_hand"]

    points = {}
    for name, mats in chains.items():
        cum = mats[0]
        cums = [cum]
        for m in mats[1:]:
            cum = torch.bmm(cum.clone(), m.clone())
            cums.append(cum)
        points[name] = torch.stack([c[:, :3, 3] for c in cums], dim=1)

    pose = torch.zeros((B, 32, 3))
    pose[:, 0] = points["body"][:, 0]
    pose[:, 1] = points["right_leg"][:, 0]
    pose[:, 2] = points["right_leg"][:, 3]
    pose[:, 3] = points["right_leg"][:, 4]
    pose[:, 6] = points["left_leg"][:, 0]
    pose[:, 7] = points["left_leg"][:, 3]
    pose[:, 8] = points["left_leg"][:, 4]
    pose[:, 12] = points["body"][:, 3]
    pose[:, 13] = points["body"][:, 6]
    pose[:, 14] = points["body"][:, 12]
    pose[:, 15] = points["body"][:, 12]
    pose[:, 17] = points["left_hand"][:, 9]
    pose[:, 18] = points["left_hand"][:, 12]
    pose[:, 19] = points["left_hand"][:, 13]
    pose[:, 25] = points["right_hand"][:, 9]
    pose[:, 26] = points["right_hand"][:, 12]
    pose[:, 27] = points["right_hand"][:, 13]
    return pose


class CriticTower(nn.Module):
    """Reference-shaped WGAN critic (Fk_discriminator.py:149-266 pattern):
    prelude + 3 residual blocks + scalar head."""

    def __init__(self, in_dim, dense=1000):
        super().__init__()
        self.pre = nn.Sequential(nn.Linear(in_dim, dense), nn.ReLU(True))
        self.b1, self.b2, self.b3 = (ResBlock(dense), ResBlock(dense),
                                     ResBlock(dense))
        self.head = nn.Linear(dense, 1)

    def forward(self, x):
        return self.head(self.b3(self.b2(self.b1(self.pre(x)))))


def bench_gan_iteration(args):
    """One reference-style WGAN-GP training iteration on torch:
    synthesis (trunk + sequential-bmm FK), 3D critic update with gradient
    penalty, 2D critic update with gradient penalty, generator update every
    5th iteration — the per-iteration work of GAN_solutions_FK_generator
    (model_fk_gan_train.py:273-510, :177-230 per critic, :415-484 generator).
    Reports iterations/s."""
    torch.manual_seed(0)
    B = args.batch
    trunk = Trunk(args.dense)
    d3d = CriticTower(48, args.dense)
    d2d = CriticTower(32, args.dense)
    opt_g = torch.optim.Adam(trunk.parameters(), lr=1e-4, betas=(0.5, 0.9))
    opt_3 = torch.optim.Adam(d3d.parameters(), lr=1e-4, betas=(0.5, 0.9))
    opt_2 = torch.optim.Adam(d2d.parameters(), lr=1e-4, betas=(0.5, 0.9))
    bone_len = torch.rand(B, 15) * 0.4 + 0.2
    real3d = torch.randn(B, 48) * 0.3
    real2d = torch.randn(B, 32) * 0.3

    def synth():
        z = torch.randn(B, 128)
        head = trunk(z)
        ang = torch.tanh(head[:, :33]) * 180.0
        pose32 = fk_reference_style(ang, bone_len, B)
        pose16 = pose32[:, [0, 1, 2, 3, 6, 7, 8, 12, 13, 15, 17, 18, 19,
                            25, 26, 27]]
        fake3d = pose16.reshape(B, 48)
        fake2d = pose16[..., :2].reshape(B, 32)
        return fake3d, fake2d

    def gp(critic, real, fake):
        alpha = torch.rand(B, 1)
        interp = (alpha * real + (1 - alpha) * fake).requires_grad_(True)
        out = critic(interp)
        grads = torch.autograd.grad(out.sum(), interp, create_graph=True)[0]
        return ((grads.norm(2, dim=1) - 1.0) ** 2).mean() * 10.0

    def critic_update(critic, opt, real, fake):
        opt.zero_grad()
        loss = critic(fake.detach()).mean() - critic(real).mean() + \
            gp(critic, real, fake.detach())
        loss.backward()
        opt.step()

    def iteration(it):
        fake3d, fake2d = synth()
        critic_update(d3d, opt_3, real3d, fake3d)
        critic_update(d2d, opt_2, real2d, fake2d)
        if it % 5 == 4:
            opt_g.zero_grad()
            f3, f2 = synth()
            g_loss = -(d3d(f3).mean() + 0.2 * d2d(f2).mean())
            g_loss.backward()
            opt_g.step()

    iteration(0)  # warmup
    t0 = time.perf_counter()
    for it in range(args.iters):
        iteration(it)
    dt = time.perf_counter() - t0
    ips = args.iters / dt
    print(f"reference-style torch GAN iteration "
          f"({'cuda' if torch.cuda.is_available() else 'cpu'}): "
          f"{ips:.3f} iters/s  ({dt / args.iters * 1000:.1f} ms/iter, "
          f"batch {B})")
    return ips


class MotionCritic(nn.Module):
    """Reference-style video motion critic: N branch towers (prelude + 3
    residual blocks each, Fk_discriminator.py:381-512 topology at production
    width) + a merge tower."""

    def __init__(self, branch_dims, dense=1000):
        super().__init__()
        self.towers = nn.ModuleList()
        for in_dim in branch_dims:
            self.towers.append(nn.ModuleList([
                nn.Sequential(nn.Linear(in_dim, dense), nn.ReLU(True)),
                ResBlock(dense), ResBlock(dense), ResBlock(dense)]))
        self.merge = nn.Sequential(nn.Linear(dense * len(branch_dims), 100),
                                   nn.ReLU(True))
        self.merge_block = ResBlock(100)
        self.head = nn.Linear(100, 1)

    def forward(self, xs):
        outs = []
        for x, (pre, b1, b2, b3) in zip(xs, self.towers):
            outs.append(b3(b2(b1(pre(x)))))
        return self.head(self.merge_block(self.merge(torch.cat(outs, -1))))


def bench_video_gan_iteration(args):
    """One reference-style VIDEO-mode WGAN-GP training iteration on torch:
    per-frame synthesis (trunk -> F*35 head -> sequential-bmm FK over B*F
    frames), then the 12-critic-update block of video_GAN_fun.py:169-418
    (single-frame 3D/2D critics + motion critics with flip AND playback
    duplication), generator update every 5th with all four critics.
    Batch 512, receptive field 9 (README.md:102)."""
    torch.manual_seed(0)
    B, F, dense = args.batch, 9, args.dense
    trunk = Trunk(dense, out=F * 35)
    d3d = CriticTower(48, dense)
    d2d = CriticTower(32, dense)
    # motion-3D: KCS(F*15) + diff-KCS((F-1)*15) + pos(F*48) + diff((F-1)*48)
    md3d = MotionCritic([F * 15, (F - 1) * 15, F * 48, (F - 1) * 48], dense)
    # motion-2D: pose(F*32) + root-trajectory-diff((F-1)*2)
    md2d = MotionCritic([F * 32, (F - 1) * 2], dense)
    opts = {m: torch.optim.Adam(m.parameters(), lr=1e-4, betas=(0.5, 0.9))
            for m in (trunk, d3d, d2d, md3d, md2d)}
    bone_len = torch.rand(B * F, 15) * 0.4 + 0.2
    real3d = torch.randn(B * F, 48) * 0.3
    real2d = torch.randn(B * F, 32) * 0.3

    def synth():
        z = torch.randn(B, 128)
        head = trunk(z).reshape(B * F, 35)
        ang = torch.tanh(head[:, :33]) * 180.0
        pose32 = fk_reference_style(ang, bone_len, B * F)
        pose16 = pose32[:, [0, 1, 2, 3, 6, 7, 8, 12, 13, 15, 17, 18, 19,
                            25, 26, 27]]
        return pose16.reshape(B * F, 48), pose16[..., :2].reshape(B * F, 32)

    def motion_views(flat, per_frame, n_joint_ch):
        """frames (B*F, D) -> the critic's branch inputs: whole-clip rows +
        temporal diffs (+ KCS-width rows for the 3D critic)."""
        clip = flat.reshape(B, F, per_frame)
        diff = clip[:, 1:] - clip[:, :-1]
        if n_joint_ch == 3:   # 3D: kcs(15) proxy rows + pos + diffs
            kcs = clip[..., :15]
            dkcs = diff[..., :15]
            return [kcs.reshape(B, -1), dkcs.reshape(B, -1),
                    clip.reshape(B, -1), diff.reshape(B, -1)]
        root = clip[..., :2]
        droot = root[:, 1:] - root[:, :-1]
        return [clip.reshape(B, -1), droot.reshape(B, -1)]

    def gp(critic, real, fake, rows):
        alpha = torch.rand(rows, 1)
        interp = (alpha * real.reshape(rows, -1)
                  + (1 - alpha) * fake.reshape(rows, -1)).requires_grad_(True)
        out = critic(interp)
        grads = torch.autograd.grad(out.sum(), interp, create_graph=True)[0]
        return ((grads.norm(2, dim=1) - 1.0) ** 2).mean() * 10.0

    def critic_update(critic, real, fake, rows):
        opts[critic].zero_grad()
        loss = critic(fake.detach()).mean() - critic(real).mean() + \
            gp(critic, real, fake.detach(), rows)
        loss.backward()
        opts[critic].step()

    def motion_update(critic, real_flat, fake_flat, ch):
        per = 48 if ch == 3 else 32
        opts[critic].zero_grad()
        loss = critic(motion_views(fake_flat.detach(), per, ch)).mean() - \
            critic(motion_views(real_flat, per, ch)).mean()
        # per-clip GP on the concatenated branch inputs (dis_mode='motion')
        alpha = torch.rand(B, 1)
        r = torch.cat(motion_views(real_flat, per, ch), -1)
        f = torch.cat(motion_views(fake_flat.detach(), per, ch), -1)
        interp = (alpha * r + (1 - alpha) * f).requires_grad_(True)
        widths = [tw[0][0].in_features for tw in critic.towers]
        xs, off = [], 0
        for w in widths:
            xs.append(interp[:, off:off + w])
            off += w
        out = critic(xs)
        grads = torch.autograd.grad(out.sum(), interp, create_graph=True)[0]
        loss = loss + ((grads.norm(2, dim=1) - 1.0) ** 2).mean() * 10.0
        loss.backward()
        opts[critic].step()

    def flipped(x):
        y = x.detach().clone()
        y[:, 0] = -y[:, 0]
        return y

    def played_back(flat, per):
        return torch.flip(flat.reshape(B, F, per), dims=[1]).reshape(B * F, per)

    def iteration(it):
        fake3d, fake2d = synth()
        # the 12-update critic block (flip x playback x motion)
        critic_update(d3d, real3d, fake3d, B * F)
        motion_update(md3d, real3d, fake3d, 3)
        motion_update(md3d, played_back(real3d, 48), played_back(fake3d, 48), 3)
        critic_update(d3d, flipped(real3d), flipped(fake3d), B * F)
        motion_update(md3d, flipped(real3d), flipped(fake3d), 3)
        motion_update(md3d, played_back(flipped(real3d), 48),
                      played_back(flipped(fake3d), 48), 3)
        critic_update(d2d, real2d, fake2d, B * F)
        motion_update(md2d, real2d, fake2d, 2)
        motion_update(md2d, played_back(real2d, 32), played_back(fake2d, 32), 2)
        critic_update(d2d, flipped(real2d), flipped(fake2d), B * F)
        motion_update(md2d, flipped(real2d), flipped(fake2d), 2)
        motion_update(md2d, played_back(flipped(real2d), 32),
                      played_back(flipped(fake2d), 32), 2)
        if it % 5 == 4:
            opts[trunk].zero_grad()
            f3, f2 = synth()
            g_loss = -(d3d(f3).mean() + 0.2 * d2d(f2).mean()
                       + md3d(motion_views(f3, 48, 3)).mean()
                       + md2d(motion_views(f2, 32, 2)).mean())
            g_loss.backward()
            opts[trunk].step()

    iteration(0)  # warmup
    t0 = time.perf_counter()
    for it in range(args.iters):
        iteration(it)
    dt = time.perf_counter() - t0
    ips = args.iters / dt
    print(f"reference-style torch VIDEO GAN iteration "
          f"({'cuda' if torch.cuda.is_available() else 'cpu'}): "
          f"{ips:.4f} iters/s  ({dt / args.iters * 1000:.0f} ms/iter, "
          f"batch {B}, F {F})")
    return ips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dense", type=int, default=1000)
    ap.add_argument("--mode", default="synthesis",
                    choices=["synthesis", "gan_iter", "video_gan_iter"])
    args = ap.parse_args()
    if args.mode == "gan_iter":
        return bench_gan_iteration(args)
    if args.mode == "video_gan_iter":
        if args.batch == 1024:
            args.batch = 512  # video-mode production batch (README.md:102)
        return bench_video_gan_iteration(args)

    torch.manual_seed(0)
    trunk = Trunk(args.dense)
    bone_len = torch.rand(args.batch, 15) * 0.4 + 0.2

    def one_batch():
        z = torch.randn(args.batch, 128)
        head = trunk(z)
        ang = torch.tanh(head[:, :33]) * 180.0
        pose32 = fk_reference_style(ang, bone_len, args.batch)
        pose16 = pose32[:, [0, 1, 2, 3, 6, 7, 8, 12, 13, 15, 17, 18, 19, 25, 26, 27]]
        # projection: pinhole + distortion
        f = torch.tensor([2.29, 2.287])
        c = torch.tensor([0.025, 0.028])
        k = torch.tensor([-0.207, 0.247, -0.003])
        p = torch.tensor([-0.001, -0.001])
        X = pose16 + torch.tensor([0.0, 0.0, 4.0])
        XX = torch.clamp(X[..., :2] / X[..., 2:], -1, 1)
        r2 = (XX ** 2).sum(-1, keepdim=True)
        radial = 1 + (k * torch.cat([r2, r2 ** 2, r2 ** 3], -1)).sum(-1, keepdim=True)
        tan = (p * XX).sum(-1, keepdim=True)
        pose2d = f * (XX * (radial + tan) + p * r2) + c
        return pose16, pose2d

    with torch.no_grad():
        one_batch()  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            one_batch()
        dt = time.perf_counter() - t0
    pps = args.batch * args.iters / dt
    print(f"reference-style torch ({'cuda' if torch.cuda.is_available() else 'cpu'}): "
          f"{pps:.1f} poses/s  ({dt / args.iters * 1000:.1f} ms/batch of {args.batch})")
    return pps


if __name__ == "__main__":
    main()
