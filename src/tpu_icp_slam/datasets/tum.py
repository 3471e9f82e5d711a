"""TUM RGB-D dataset loader (N16) — fr1/xyz-style directory layout.

Format-exact so the real benchmark drops in (no datasets exist in this
sandbox — SURVEY.md §7): 16-bit depth PNGs scaled by 5000, `depth.txt`
(timestamp path) index, optional `groundtruth.txt` (timestamp tx ty tz qx qy
qz qw). A writer serializes synthetic scenes in the same layout for tests.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

DEPTH_FACTOR = 5000.0


@dataclasses.dataclass
class TumSequence:
    depths: np.ndarray  # (F, H, W) meters, 0 invalid
    timestamps: np.ndarray  # (F,)
    gt_poses: np.ndarray | None  # (F, 4, 4) camera-to-world, matched by time
    intrinsics: tuple  # (fx, fy, cx, cy)


def _quat_to_R(qx, qy, qz, qw):
    n = np.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
    return np.array(
        [
            [1 - 2 * (qy**2 + qz**2), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx**2 + qz**2), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx**2 + qy**2)],
        ]
    )


def _read_png16(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"cannot read {path}")
    return img.astype(np.float64)


def load_sequence(
    root: str,
    max_frames: int = 0,
    intrinsics: tuple = (517.3, 516.5, 318.6, 255.3),
) -> TumSequence:
    index = os.path.join(root, "depth.txt")
    entries = []
    with open(index) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, rel = line.split()[:2]
            entries.append((float(ts), os.path.join(root, rel)))
    if max_frames > 0:
        entries = entries[:max_frames]
    depths = np.stack([_read_png16(p) / DEPTH_FACTOR for _, p in entries])
    stamps = np.asarray([t for t, _ in entries])

    gt = None
    gt_file = os.path.join(root, "groundtruth.txt")
    if os.path.exists(gt_file):
        rows = []
        with open(gt_file) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                vals = [float(v) for v in line.split()]
                rows.append(vals)
        rows = np.asarray(rows)
        # nearest-timestamp association
        gt = []
        for t in stamps:
            i = int(np.argmin(np.abs(rows[:, 0] - t)))
            tx, ty, tz, qx, qy, qz, qw = rows[i, 1:8]
            T = np.eye(4)
            T[:3, :3] = _quat_to_R(qx, qy, qz, qw)
            T[:3, 3] = (tx, ty, tz)
            gt.append(T)
        gt = np.stack(gt)
    return TumSequence(depths=depths, timestamps=stamps, gt_poses=gt, intrinsics=intrinsics)


def write_sequence(
    root: str,
    depths: np.ndarray,
    gt_poses: np.ndarray | None = None,
    timestamps: np.ndarray | None = None,
) -> None:
    """Serialize (F, H, W) metric depths in the exact TUM on-disk layout."""
    import cv2

    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    f_count = len(depths)
    ts = timestamps if timestamps is not None else np.arange(f_count) * (1.0 / 30) + 1e9
    with open(os.path.join(root, "depth.txt"), "w") as idx:
        idx.write("# timestamp filename\n")
        for i in range(f_count):
            rel = f"depth/{ts[i]:.6f}.png"
            img = np.clip(depths[i] * DEPTH_FACTOR, 0, 65535).astype(np.uint16)
            cv2.imwrite(os.path.join(root, rel), img)
            idx.write(f"{ts[i]:.6f} {rel}\n")
    if gt_poses is not None:
        with open(os.path.join(root, "groundtruth.txt"), "w") as g:
            g.write("# timestamp tx ty tz qx qy qz qw\n")
            for i in range(f_count):
                T = gt_poses[i]
                t = T[:3, 3]
                R = T[:3, :3]
                qw = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
                if qw > 1e-8:
                    qx = (R[2, 1] - R[1, 2]) / (4 * qw)
                    qy = (R[0, 2] - R[2, 0]) / (4 * qw)
                    qz = (R[1, 0] - R[0, 1]) / (4 * qw)
                else:  # rare near-pi case; good enough for fixtures
                    qx, qy, qz = 1.0, 0.0, 0.0
                g.write(
                    f"{ts[i]:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n"
                )
