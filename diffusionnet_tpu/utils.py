"""Host/device utilities.

Capability parity with reference src/diffusion_net/utils.py (hashing utils.py:71-76,
rotations utils.py:30-114, label smoothing utils.py:18-24, fs helper utils.py:117-119),
re-designed for JAX: rotations are pure functions of an explicit PRNG key (no hidden
global RNG state), and the loss is jnp-traced.
"""

from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Hashing & filesystem (host side; keys the operator / geodesic disk caches)
# ---------------------------------------------------------------------------

def hash_arrays(arrs) -> str:
    """Running SHA1 over the raw bytes of a list of numpy arrays.

    Behavior-compatible with reference utils.py:71-76 so cache keys are stable
    across runs for identical (verts, faces) inputs.
    """
    running_hash = hashlib.sha1()
    for arr in arrs:
        arr = np.ascontiguousarray(np.asarray(arr))
        running_hash.update(arr.view(np.uint8))
    return running_hash.hexdigest()


def ensure_dir_exists(d: str) -> None:
    os.makedirs(d, exist_ok=True)


def _machine_fingerprint() -> str:
    """Short stable fingerprint of THIS host's ISA surface. XLA:CPU AOT
    executables bake in the compile machine's feature set; reusing a cache
    entry compiled on a different host risks SIGILL (observed as
    machine-feature-mismatch warnings when a shared cache dir crossed machine
    types). Keying the cache dir per fingerprint scopes entries per-machine."""
    import hashlib
    import platform as _platform

    bits = [_platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        bits.append(_platform.processor())
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str = "~/.cache/jax_compilation") -> None:
    """Enable JAX's persistent compilation cache (large jitted programs on slow
    toolchains recompile in seconds instead of minutes across processes).
    The directory is suffixed with a per-machine ISA fingerprint so AOT
    executables never cross machine types (SIGILL hazard)."""
    import jax
    path = os.path.join(os.path.expanduser(path), _machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)


def to_np(x) -> np.ndarray:
    """Definitely convert a jax/numpy array to a host numpy array
    (analogue of reference utils.py:12-16 ``toNP``)."""
    return np.asarray(jax.device_get(x))


# ---------------------------------------------------------------------------
# Rotation augmentation (functional: explicit PRNG key)
# ---------------------------------------------------------------------------

def random_rotation_matrix(key, dtype=jnp.float32):
    """Uniform random rotation in SO(3) via the Householder construction
    (same math as reference utils.py:78-114, expressed in jnp on an explicit key)."""
    u = jax.random.uniform(key, (3,), dtype=jnp.float32)
    theta = u[0] * 2.0 * jnp.pi       # rotation about the pole (Z)
    phi = u[1] * 2.0 * jnp.pi         # direction of pole deflection
    z = u[2] * 2.0                    # magnitude of pole deflection

    r = jnp.sqrt(z)
    V = jnp.stack([jnp.sin(phi) * r, jnp.cos(phi) * r, jnp.sqrt(2.0 - z)])

    st, ct = jnp.sin(theta), jnp.cos(theta)
    R = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    R = R.at[0, 0].set(ct).at[0, 1].set(st).at[1, 0].set(-st).at[1, 1].set(ct)

    M = (jnp.outer(V, V) - jnp.eye(3)) @ R
    return M.astype(dtype)


def random_rotate_points(pts, key):
    """Right-multiply points by a uniform random rotation (reference utils.py:30-33)."""
    R = random_rotation_matrix(key, dtype=pts.dtype)
    return pts @ R


def random_rotate_points_y(pts, key):
    """Random rotation about the Y axis only (reference utils.py:35-45)."""
    angle = jax.random.uniform(key, (), dtype=pts.dtype) * (2.0 * jnp.pi)
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero = jnp.zeros((), dtype=pts.dtype)
    one = jnp.ones((), dtype=pts.dtype)
    R = jnp.stack([
        jnp.stack([c, zero, s]),
        jnp.stack([zero, one, zero]),
        jnp.stack([-s, zero, c]),
    ])
    return pts @ R


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def label_smoothing_log_loss(pred, labels, smoothing: float = 0.0):
    """Smoothed negative log-likelihood on log-probability inputs.

    Matches reference utils.py:18-24 for the global-classification use
    (single label vector indexing dim 0, classification_shrec11.py:146):
    ``one_hot[labels] = 1`` with labels an int index into the class dim.
    Generalized here: works for pred of shape (..., n_class) with integer
    labels of shape (...,).
    """
    n_class = pred.shape[-1]
    one_hot = jax.nn.one_hot(labels, n_class, dtype=pred.dtype)
    one_hot = one_hot * (1.0 - smoothing) + (1.0 - one_hot) * smoothing / (n_class - 1)
    return -jnp.mean(jnp.sum(one_hot * pred, axis=-1))


def normalize_positions_np(pos: np.ndarray, faces=None, method: str = "mean",
                           scale_method: str = "max_rad") -> np.ndarray:
    """Host (numpy) version of ops.normalize_positions for dataset preprocessing
    (reference geometry.py:635-665 semantics)."""
    pos = np.asarray(pos, dtype=np.float64)
    if method == "mean":
        pos = pos - pos.mean(axis=-2, keepdims=True)
    elif method == "bbox":
        center = (pos.max(axis=-2) + pos.min(axis=-2)) / 2.0
        pos = pos - center[..., None, :]
    else:
        raise ValueError("unrecognized method")

    if scale_method == "max_rad":
        # keepdims so a batched (B, V, 3) input scales per batch element
        # (like ops.transforms.normalize_positions) instead of broadcasting
        # (B,) against the coordinate axis
        scale = np.linalg.norm(pos, axis=-1).max(axis=-1, keepdims=True)
        pos = pos / scale[..., None]
    elif scale_method == "area":
        if faces is None:
            raise ValueError("must pass faces for area normalization")
        coords = pos[faces]
        fa = 0.5 * np.linalg.norm(
            np.cross(coords[:, 1] - coords[:, 0], coords[:, 2] - coords[:, 0]),
            axis=-1)
        pos = pos / np.sqrt(fa.sum())
    else:
        raise ValueError("unrecognized scale method")
    return pos


# ---------------------------------------------------------------------------
# Padding / bucketing helpers (TPU static-shape machinery; new capability)
# ---------------------------------------------------------------------------

DEFAULT_BUCKETS = (256, 1024, 4096, 8192, 16384, 32768, 65536, 131072, 262144)


def round_up_to_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_size(n: int, buckets=DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= n; XLA compiles once per bucket instead of per shape."""
    for b in buckets:
        if n <= b:
            return b
    return round_up_to_multiple(n, 8192)


def pad_to(arr: np.ndarray, n: int, axis: int = 0, value=0):
    """Pad `arr` along `axis` up to length n with a constant."""
    arr = np.asarray(arr)
    cur = arr.shape[axis]
    if cur == n:
        return arr
    if cur > n:
        raise ValueError(f"cannot pad axis of size {cur} down to {n}")
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, n - cur)
    return np.pad(arr, widths, mode="constant", constant_values=value)
