"""Quaternion / Euler / rigid-transform math (host-side, numpy).

Scene construction happens once on the host, so transforms use plain numpy and
produce flat float32 arrays that the device kernels consume.  Conventions
follow the reference renderer so its JSON scenes load verbatim:

- Euler angles are (pitch_x, yaw_y, roll_z) in degrees in scene files
  (`Demo/SceneLoader.cpp:207-213`), applied as R = Ry(yaw) ∘ Rx(pitch) ∘ Rz(roll)
  (`Core/Math/Quaternion.cpp:156-181`).
- Matrices are row-major with *row-vector* convention: rows 0..2 are the images
  of the local X/Y/Z axes, row 3 is the translation
  (`Core/Math/Quaternion.cpp:200-208`, `Core/Math/Transform.cpp:89-93`).
  ``transform_point(M, p) = p.x*M[0] + p.y*M[1] + p.z*M[2] + M[3]``.
"""

from __future__ import annotations

import numpy as np


def quat_from_euler_deg(angles) -> np.ndarray:
    """Quaternion (x, y, z, w) from Euler degrees (pitch, yaw, roll)."""
    pitch, yaw, roll = [np.deg2rad(float(a)) * 0.5 for a in angles]
    sp, cp = np.sin(pitch), np.cos(pitch)
    sy, cy = np.sin(yaw), np.cos(yaw)
    sr, cr = np.sin(roll), np.cos(roll)
    # q = q_y(yaw) * q_x(pitch) * q_z(roll)  (Hamilton product)
    return np.array(
        [
            cy * cr * sp + sy * sr * cp,
            sy * cr * cp - cy * sr * sp,
            cy * sr * cp - sy * cr * sp,
            cy * cr * cp + sy * sr * sp,
        ],
        dtype=np.float64,
    )


def quat_to_matrix3(q) -> np.ndarray:
    """3x3 rotation matrix whose ROWS are the rotated basis axes.

    Row i = image of local axis i under the rotation (row-vector convention).
    """
    x, y, z, w = [float(v) for v in q]
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)],
            [2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w)],
            [2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float64,
    )


class RigidTransform:
    """Rotation + translation, mirroring the reference `Transform` type."""

    def __init__(self, translation=(0.0, 0.0, 0.0), euler_deg=(0.0, 0.0, 0.0), scale=1.0):
        self.translation = np.asarray(translation, dtype=np.float64)
        self.rot = quat_to_matrix3(quat_from_euler_deg(euler_deg))
        self.scale = float(scale)

    # row-vector convention: world = local @ R + t
    def transform_point(self, p) -> np.ndarray:
        return np.asarray(p, np.float64) * self.scale @ self.rot + self.translation

    def transform_vector(self, v) -> np.ndarray:
        return np.asarray(v, np.float64) * self.scale @ self.rot

    def rotate_vector(self, v) -> np.ndarray:
        return np.asarray(v, np.float64) @ self.rot

    def inverse_rotate_vector(self, v) -> np.ndarray:
        return np.asarray(v, np.float64) @ self.rot.T

    def inverse_transform_point(self, p) -> np.ndarray:
        return ((np.asarray(p, np.float64) - self.translation) @ self.rot.T) / self.scale

    @property
    def axis_x(self) -> np.ndarray:
        return self.rot[0]

    @property
    def axis_y(self) -> np.ndarray:
        return self.rot[1]

    @property
    def axis_z(self) -> np.ndarray:
        return self.rot[2]


def parse_transform(obj: dict | None) -> RigidTransform:
    """Parse the reference JSON ``transform`` block (`SceneLoader.cpp:189-214`)."""
    if not obj:
        return RigidTransform()
    return RigidTransform(
        translation=obj.get("translation", (0.0, 0.0, 0.0)),
        euler_deg=obj.get("orientation", (0.0, 0.0, 0.0)),
        scale=obj.get("scale", 1.0),
    )
