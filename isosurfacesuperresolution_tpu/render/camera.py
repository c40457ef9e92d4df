"""Cameras: view/projection matrices, pixel rays, and the orbit controller.

Replaces two reference components with one module:

* the GVDB `Camera3D` matrix plumbing the DLL uploads per frame
  (`GPURendererDirect.cpp:309-339`: MVP = proj * view, normal matrix = view
  rotation), and
* the Python orbit camera with axis-permutation orientations
  (`inference/camera.py:4-98`).

Conventions (self-consistent, verified by tests rather than copied from GVDB):
right-handed world, view matrix maps world -> camera with the camera looking
down -z, GL-style projection with NDC depth in [-1, 1].  Pixel (x, y) has
x growing right, y growing *down* (row 0 is the top of the image); NDC y grows
up, so v = (y + 0.5)/H maps to ndc_y = 1 - 2v - matching the reference's ray
generation `getViewRay((x+0.5)/W, (y+0.5)/H)` (`render_kernel.cu:212`).
"""

from __future__ import annotations

import dataclasses
import math
from enum import Enum
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


Vec3 = Tuple[float, float, float]


# ---------------------------------------------------------------------------
# Matrix builders (work on jnp arrays so they can live inside jit)
# ---------------------------------------------------------------------------

def normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def look_at(eye: jnp.ndarray, center: jnp.ndarray, up: jnp.ndarray
            ) -> jnp.ndarray:
    """World -> view matrix (4x4); camera at ``eye`` looking at ``center``."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = normalize(center - eye)            # forward
    s = normalize(jnp.cross(f, up))        # right
    u = jnp.cross(s, f)                    # true up
    rot = jnp.stack([s, u, -f])            # rows: right, up, backward
    trans = -rot @ eye
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    m = m.at[:3, 3].set(trans)
    return m


def perspective(fov_y_degrees: float, aspect: float,
                z_near: float, z_far: float) -> jnp.ndarray:
    """GL-style perspective projection (4x4), NDC depth in [-1, 1]."""
    f = 1.0 / math.tan(math.radians(float(fov_y_degrees)) / 2.0)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set((z_far + z_near) / (z_near - z_far))
    m = m.at[2, 3].set(2.0 * z_far * z_near / (z_near - z_far))
    m = m.at[3, 2].set(-1.0)
    return m


def project(mvp: jnp.ndarray, p_world: jnp.ndarray) -> jnp.ndarray:
    """Project world points (..., 3) to NDC (..., 3) through a 4x4 MVP."""
    ph = jnp.concatenate([p_world, jnp.ones_like(p_world[..., :1])], axis=-1)
    clip = ph @ mvp.T
    return clip[..., :3] / clip[..., 3:4]


# ---------------------------------------------------------------------------
# Camera parameter bundle (a pytree: usable as a jit argument)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CameraParams:
    """Everything the renderer needs about one camera pose."""

    eye: jnp.ndarray          # (3,)
    look_at_pt: jnp.ndarray   # (3,)
    up: jnp.ndarray           # (3,)
    fov_y_degrees: float      # static
    z_near: float = 0.1
    z_far: float = 10.0

    def tree_flatten(self):
        return ((self.eye, self.look_at_pt, self.up),
                (self.fov_y_degrees, self.z_near, self.z_far))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], *aux)

    @classmethod
    def create(cls, eye: Sequence[float], look_at_pt: Sequence[float] = (0, 0, 0),
               up: Sequence[float] = (0, 1, 0), fov_y_degrees: float = 45.0,
               z_near: float = 0.1, z_far: float = 10.0) -> "CameraParams":
        return cls(jnp.asarray(eye, jnp.float32),
                   jnp.asarray(look_at_pt, jnp.float32),
                   jnp.asarray(up, jnp.float32),
                   float(fov_y_degrees), float(z_near), float(z_far))

    def view_matrix(self) -> jnp.ndarray:
        return look_at(self.eye, self.look_at_pt, self.up)

    def mvp(self, width: int, height: int) -> jnp.ndarray:
        proj = perspective(self.fov_y_degrees, width / height,
                           self.z_near, self.z_far)
        return proj @ self.view_matrix()

    def normal_matrix(self) -> jnp.ndarray:
        """3x3 rotation mapping world normals to view space
        (parity: `GPURendererDirect.cpp:336-338`)."""
        return self.view_matrix()[:3, :3]

    def pixel_rays(self, width: int, height: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Ray origin (3,) and per-pixel world directions (H, W, 3).

        Rays pass through pixel centers ((x+0.5)/W, (y+0.5)/H), matching
        `render_kernel.cu:212`; directions are normalized.
        """
        view = self.view_matrix()
        rot_t = view[:3, :3].T  # view -> world rotation
        tan_half = math.tan(math.radians(self.fov_y_degrees) / 2.0)
        aspect = width / height
        x = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
        y = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
        ndc_x = 2.0 * x - 1.0                    # (W,)
        ndc_y = 1.0 - 2.0 * y                    # (H,) top row looks up
        dx = ndc_x[None, :] * (tan_half * aspect)   # (1, W)
        dy = ndc_y[:, None] * tan_half              # (H, 1)
        dirs_view = jnp.stack([
            jnp.broadcast_to(dx, (height, width)),
            jnp.broadcast_to(dy, (height, width)),
            -jnp.ones((height, width), jnp.float32),
        ], axis=-1)                               # (H, W, 3)
        dirs_world = dirs_view @ rot_t.T
        return self.eye, normalize(dirs_world)


# ---------------------------------------------------------------------------
# Orbit controller (parity: inference/camera.py)
# ---------------------------------------------------------------------------

class Orientation(Enum):
    """Axis permutations letting the user pick which axis is 'up'.

    Parity: `inference/camera.py:4-37`.  Each value carries (up vector,
    1-indexed signed permutation, invert-yaw flag).
    """

    Xp = 1, (1, 0, 0), (2, -1, -3), True
    Xm = 2, (-1, 0, 0), (-2, 1, 3), False
    Yp = 3, (0, 1, 0), (1, 2, 3), False
    Ym = 4, (0, -1, 0), (-1, -2, -3), True
    Zp = 5, (0, 0, 1), (-3, -1, 2), False
    Zm = 6, (0, 0, -1), (3, 1, -2), True

    def __new__(cls, value, up, permute, inv_yaw):
        obj = object.__new__(cls)
        obj._value_ = value
        obj.up = up
        obj.permute = permute
        obj.inv_yaw = inv_yaw
        return obj


class OrbitCamera:
    """Interactive orbit camera: pitch/yaw/zoom around a look-at point.

    Parity: `inference/camera.py:39-98` (speed constants, pitch clamp to
    +-80 degrees, exponential zoom).
    """

    def __init__(self, res_x: int, res_y: int,
                 origin: Sequence[float] = (0.0, 1.0, -1.7),
                 fov_y_degrees: float = 45.0):
        self.res_x = res_x
        self.res_y = res_y
        self.look_at_pt = [0.0, 0.0, 0.0]
        self.speed = 0.01
        self.zoom_speed = 1.1
        self.fov_y_degrees = fov_y_degrees
        self.orientation = Orientation.Yp
        d, p, yaw = self.to_angles(origin)
        self.current_distance = d
        self.current_pitch = p
        self.current_yaw = yaw
        self.base_distance = d
        self.zoom_value = 0.0
        self._old = (d, p, yaw)

    @staticmethod
    def to_angles(pos: Sequence[float]) -> Tuple[float, float, float]:
        length = math.sqrt(pos[0] ** 2 + pos[1] ** 2 + pos[2] ** 2)
        pitch = math.asin(pos[1] / length)
        yaw = math.atan2(pos[2], pos[0])
        return length, pitch, yaw

    @staticmethod
    def from_angles(length: float, pitch: float, yaw: float) -> list:
        return [math.cos(pitch) * math.cos(yaw) * length,
                math.sin(pitch) * length,
                math.cos(pitch) * math.sin(yaw) * length]

    def get_origin(self) -> list:
        yaw = self.current_yaw * (-1 if self.orientation.inv_yaw else 1)
        o1 = self.from_angles(self.current_distance, self.current_pitch, yaw)
        o2 = [0.0, 0.0, 0.0]
        for i in range(3):
            p = self.orientation.permute[i]
            o2[i] = o1[abs(p) - 1] * (1 if p > 0 else -1)
        return o2

    def get_up(self) -> Tuple[float, float, float]:
        return self.orientation.up

    def start_move(self):
        self._old = (self.current_distance, self.current_pitch, self.current_yaw)

    def move(self, dx: float, dy: float):
        _, old_pitch, old_yaw = self._old
        self.current_pitch = max(math.radians(-80),
                                 min(math.radians(80),
                                     old_pitch + self.speed * dy))
        self.current_yaw = old_yaw + self.speed * dx

    def zoom(self, delta: float):
        self.zoom_value += delta
        self.current_distance = self.base_distance * (self.zoom_speed ** self.zoom_value)

    def params(self, z_near: float = 0.1, z_far: float = 10.0) -> CameraParams:
        return CameraParams.create(self.get_origin(), self.look_at_pt,
                                   self.get_up(), self.fov_y_degrees,
                                   z_near, z_far)


def random_sphere_camera(rng: np.random.RandomState,
                         distance_range: Tuple[float, float] = (1.2, 2.0),
                         fov_y_degrees: float = 45.0) -> CameraParams:
    """Uniformly random camera on a sphere looking at the origin.

    Used by the data generator and the all-angle PSNR harness
    (parity: `DataGeneratorVideo.py:110-136`, `mainPSNR2_AllAngles.py:145-151`).
    """
    v = rng.normal(size=3)
    v /= np.linalg.norm(v)
    d = rng.uniform(*distance_range)
    eye = v * d
    # pick an up vector not parallel to the view direction
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(v, up)) > 0.95:
        up = np.array([1.0, 0.0, 0.0])
    return CameraParams.create(eye, (0, 0, 0), up, fov_y_degrees)
