"""Independent, deliberately-naive numpy DH forward kinematics used as the
test oracle for dhaug_tpu.ops.fk.

This transcribes the *mathematical definition* (modified-DH link matrices,
sequential 4x4 chain products, XYZ Euler global rotation, H36M 32-slot
scatter) directly, one scalar pose at a time, with no vectorization tricks —
so that agreement with the vectorized (R, p)-recurrence implementation in
dhaug_tpu.ops.fk is meaningful.  Constants follow the DH tables documented in
SURVEY.md §2 (forward_kinematics_DH_model.py:234-261).
"""
import numpy as np


def dh_mat(alpha, a, d, theta):
    al = np.deg2rad(alpha)
    th = np.deg2rad(theta)
    return np.array([
        [np.cos(th), -np.sin(th), 0.0, a],
        [np.sin(th) * np.cos(al), np.cos(th) * np.cos(al), -np.sin(al), -np.sin(al) * d],
        [np.sin(th) * np.sin(al), np.cos(th) * np.sin(al), np.cos(al), np.cos(al) * d],
        [0.0, 0.0, 0.0, 1.0],
    ])


def rot_xyz(ax, ay, az):
    ax, ay, az = np.deg2rad([ax, ay, az])
    R1 = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    R2 = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    R3 = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    return R1 @ R2 @ R3


def reference_fk_single(angles33, bone_len15, global_rot3, root3):
    """One pose: angles (33,), bone lengths (15,), rotation (3,), root (3,).
    Returns (32, 3)."""
    (l_sleg, r_sleg, l_bleg, r_bleg, l_hip, r_hip, waist, thorax,
     l_sh, r_sh, l_barm, r_barm, l_sarm, r_sarm, neck) = bone_len15

    r_leg_ang = angles33[0:5]
    l_leg_ang = angles33[5:10]
    body_ang = angles33[10:23]
    r_hand_ang = angles33[23:28]
    l_hand_ang = angles33[28:33]

    r_leg = dict(alpha=[0, -90, -90, 0, 0], a=[r_hip, 0, 0, r_bleg, r_sleg],
                 d=[0] * 5, theta=[0, -90, 180, 0, 0], ang=r_leg_ang)
    l_leg = dict(alpha=[0, 90, 90, 0, 0], a=[-l_hip, 0, 0, l_bleg, l_sleg],
                 d=[0] * 5, theta=[180, -90, 0, 0, 0], ang=l_leg_ang)
    body = dict(alpha=[0] + [-90] * 11 + [90],
                a=[0] * 12 + [neck],
                d=[0, 0, 0, waist, 0, 0, thorax, 0, 0, 0, 0, 0, 0],
                theta=[90] + [-90] * 10 + [0, 0], ang=body_ang)
    r_hand = dict(alpha=[-90, -90, -90, 0, 0], a=[-r_sh, 0, 0, r_barm, r_sarm],
                  d=[0] * 5, theta=[-180, -90, 180, 0, 0], ang=r_hand_ang)
    l_hand = dict(alpha=[-90, 90, 90, 0, 0], a=[l_sh, 0, 0, l_barm, l_sarm],
                  d=[0] * 5, theta=[0, -90, 0, 0, 0], ang=l_hand_ang)

    def links(spec):
        return [dh_mat(spec["alpha"][i], spec["a"][i], spec["d"][i],
                       spec["theta"][i] + spec["ang"][i])
                for i in range(len(spec["alpha"]))]

    def cumprod(mats):
        out = []
        acc = np.eye(4)
        for m in mats:
            acc = acc @ m
            out.append(acc.copy())
        return out

    body_links = links(body)
    r_leg_cum = cumprod(links(r_leg))
    l_leg_cum = cumprod(links(l_leg))
    body_cum = cumprod(body_links)
    r_hand_cum = cumprod(body_links[:9] + links(r_hand))
    l_hand_cum = cumprod(body_links[:9] + links(l_hand))

    R = rot_xyz(*global_rot3)

    def pt(cum, i):
        return R @ cum[i][:3, 3]

    pose = np.zeros((32, 3))
    pose[0] = pt(body_cum, 0)
    pose[1] = pt(r_leg_cum, 0)
    pose[2] = pt(r_leg_cum, 3)
    pose[3] = pt(r_leg_cum, 4)
    pose[6] = pt(l_leg_cum, 0)
    pose[7] = pt(l_leg_cum, 3)
    pose[8] = pt(l_leg_cum, 4)
    pose[12] = pt(body_cum, 3)
    pose[13] = pt(body_cum, 6)
    pose[14] = pt(body_cum, 12)
    pose[15] = pt(body_cum, 12)
    pose[17] = pt(l_hand_cum, 9)
    pose[18] = pt(l_hand_cum, 12)
    pose[19] = pt(l_hand_cum, 13)
    pose[25] = pt(r_hand_cum, 9)
    pose[26] = pt(r_hand_cum, 12)
    pose[27] = pt(r_hand_cum, 13)
    pose += np.asarray(root3)
    return pose
