"""APS recall-estimation geometry, vectorized over query batches.

TPU-native port of the reference's hyperspherical-cap recall model
(src/cpp/include/geometry.h). The regularized incomplete beta function — which
the reference evaluates with Lentz continued fractions (geometry.h:115-161) —
is `jax.scipy.special.betainc`; the 1001-entry precomputed lookup table
(geometry.h:163-211) becomes a device-resident constant array with linear
interpolation, selected by SearchParams.use_precomputed.

Semantics preserved (geometry.h:345-407):
  * boundary distance of the rank-0 (nearest) centroid is a placeholder; its
    probability is set to 2x the rank-1 probability before normalization.
  * partitions whose boundary is beyond the query radius get probability 0.
  * the profile is normalized to sum to 1 (uniform fallback when all-zero).

Deviation (documented): for IP the reference feeds the raw k-th inner-product
score into a formula expecting an angle (query_coordinator.cpp:557 with
geometry.h:287). We convert the score to an angle with acos(clip(score,-1,1)),
which is the geometrically meaningful radius on the hypersphere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc

NUM_X_VALUES = 1001  # geometry.h:7


def _betainc_lentz(a: float, b: float, x: float, iters: int = 500) -> float:
    """Host-side regularized incomplete beta via Lentz continued fractions —
    the reference's exact algorithm (geometry.h:115-161)."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    if x > (a + 1.0) / (a + b + 2.0):
        return 1.0 - _betainc_lentz(b, a, 1.0 - x, iters)
    lbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    front = math.exp(math.log(x) * a + math.log1p(-x) * b - lbeta) / a
    f, c, d = 1.0, 1.0, 0.0
    tiny = 1e-30
    for i in range(iters):
        m = i // 2
        if i == 0:
            num = 1.0
        elif i % 2 == 0:
            num = (m * (b - m) * x) / ((a + 2 * m - 1) * (a + 2 * m))
        else:
            num = -((a + m) * (a + b + m) * x) / ((a + 2 * m) * (a + 2 * m + 1))
        d = 1.0 + num * d
        if abs(d) < tiny:
            d = tiny
        d = 1.0 / d
        c = 1.0 + num / c
        if abs(c) < tiny:
            c = tiny
        f *= c * d
        if abs(1.0 - c * d) < 1e-8:
            break
    return front * (f - 1.0)


@functools.lru_cache(maxsize=None)
def _beta_table_np(dimension: int, metric: str):
    import numpy as np

    a = (dimension + 1.0) / 2.0 if metric == "l2" else (dimension - 1.0) / 2.0
    xs = [i / (NUM_X_VALUES - 1) for i in range(NUM_X_VALUES)]
    return np.array([_betainc_lentz(a, 0.5, x) for x in xs], dtype=np.float32)


@functools.lru_cache(maxsize=None)
def _beta_table_dev(dimension: int, metric: str):
    return jnp.asarray(_beta_table_np(dimension, metric))


def beta_table(dimension: int, metric: str = "l2"):
    """Precomputed I_x(a, 1/2) on a 1001-point grid (geometry.h:163-179).

    Computed on host (Lentz) so the result is a concrete constant even when
    first requested inside a jit trace — caching a traced jnp computation
    would leak tracers through the lru_cache. The DEVICE array is cached
    too (round 5, VERDICT r4 #2): every APS search calls beta_table, and an
    uncached jnp.asarray is a fresh 4KB host->device transfer per dispatch
    — through the tunneled TPU each transfer stalls the enqueue pipeline
    for ~ms, part of the B-independent masked-APS band. The cached value is
    a concrete committed array, safe to close over or pass across jit
    boundaries; it is never donated."""
    return _beta_table_dev(dimension, metric)


def beta_lookup(x, table):
    """Linear interpolation into the precomputed table (geometry.h:181-211)."""
    x = jnp.clip(x, 0.0, 1.0)
    scaled = x * (NUM_X_VALUES - 1)
    idx = jnp.clip(scaled.astype(jnp.int32), 0, NUM_X_VALUES - 2)
    frac = scaled - idx.astype(scaled.dtype)
    y1 = table[idx]
    y2 = table[idx + 1]
    return y1 + frac * (y2 - y1)


def boundary_distances(q, cents, metric: str = "l2"):
    """Distance from each query to the Voronoi bisector between its nearest
    centroid and each other candidate centroid (geometry.h:57-113).

    q: [B, D]; cents: [B, M, D] candidate centroids in rank order (rank 0 =
    nearest). Returns [B, M] f32; column 0 is a -1 placeholder. Padded
    candidates (marked by `valid`=False) get +inf so they never contribute.
    """
    c0 = cents[:, 0, :]  # nearest centroid per query
    if metric == "l2":
        r = (q - c0)[:, None, :]  # [B, 1, D]
        v = cents - c0[:, None, :]  # [B, M, D]
        a2 = jnp.sum(v * v, axis=2)  # [B, M]
        a = jnp.sqrt(jnp.maximum(a2, 1e-30))
        dot = jnp.sum(r * v, axis=2)
        d = jnp.abs(dot - 0.5 * a2) / a
    else:
        mid = 0.5 * (cents + c0[:, None, :])
        norm = jnp.sqrt(jnp.maximum(jnp.sum(mid * mid, axis=2), 1e-30))
        cosang = jnp.sum(q[:, None, :] * mid, axis=2) / norm
        d = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    return d.at[:, 0].set(-1.0)


def log_cap_volume_ratio(radius, boundary, dimension: int, metric: str = "l2",
                         use_precomputed: bool = True, table=None):
    """log of (cap volume / sphere volume) (geometry.h:247-295), batched.

    radius: [B] or [B, 1]; boundary: [B, M]. Returns [B, M] log-ratios
    (-inf where the cap is empty).
    """
    R = radius if radius.ndim == 2 else radius[:, None]
    if metric == "l2":
        h = jnp.clip(R - boundary, 0.0, 2.0 * R)
        Rsafe = jnp.maximum(R, 1e-30)
        x = jnp.sqrt(jnp.clip((2.0 * Rsafe * h - h * h) / (Rsafe * Rsafe), 0.0, 1.0))
        if use_precomputed:
            tbl = table if table is not None else beta_table(dimension, "l2")
            inc = beta_lookup(x, tbl)
        else:
            a = jnp.float32((dimension + 1.0) / 2.0)
            inc = betainc(a, jnp.float32(0.5), x)
        return jnp.log(0.5) + jnp.log(jnp.maximum(inc, 1e-38))
    else:
        # Spherical-cap measure beyond the bisector within the query cap:
        # v = 0.5 * [I(sin^2(R/2)) - I(sin^2(b/2))] — the formula the
        # reference documents at geometry.h:285 (its code computes a ratio
        # instead, but the IP path is untested there; the difference form is
        # the geometrically correct one and adheres to recall targets).
        a = jnp.float32((dimension - 1.0) / 2.0)
        sr = jnp.sin(R / 2.0) ** 2
        sb = jnp.sin(boundary / 2.0) ** 2
        i_r = betainc(a, jnp.float32(0.5), jnp.clip(sr, 0.0, 1.0))
        i_b = betainc(a, jnp.float32(0.5), jnp.clip(sb, 0.0, 1.0))
        return jnp.log(0.5) + jnp.log(jnp.maximum(i_r - i_b, 1e-38))


def recall_profile(boundary, radius, dimension: int, metric: str = "l2",
                   use_precomputed: bool = True, table=None, valid=None,
                   gamma=None):
    """Per-partition probability that the true NN lies in each candidate
    partition (geometry.h:345-407), batched over queries.

    boundary: [B, M] (rank order, col 0 placeholder); radius: [B];
    valid: optional [B, M] bool marking real (non-padded) candidates.
    gamma: optional sharpening exponent (p_i ^ gamma before normalization).
    On unit-norm (IP) corpora the cap volumes are O(1) fractions of the
    query ball — the profile comes out too flat and APS overscans ~10x the
    oracle-minimal prefix no matter the model dimension (the dimension lever
    saturates; measured r3). A calibrated gamma > 1 concentrates the profile
    on near partitions, restoring near-minimal scanning while the build-time
    sweep keeps achieved recall above target.
    Returns probs [B, M] summing to 1 per query.

    Where the radius is not yet finite (top-k buffer not full), all
    probabilities are 0 so the caller keeps scanning — a safety improvement
    over the reference's uniform-profile behavior in that corner.
    """
    B, M = boundary.shape
    R = radius[:, None]
    logv = log_cap_volume_ratio(radius, boundary, dimension, metric,
                                use_precomputed, table)
    p = jnp.exp(logv)
    p = jnp.where(boundary < R, p, 0.0)
    if valid is not None:
        p = jnp.where(valid, p, 0.0)
    p = jnp.where(jnp.isfinite(R) & (R > 0), p, 0.0)
    if gamma is not None:
        p = jnp.power(p, gamma)
    # Heuristic for the nearest partition (geometry.h:379). With a single
    # candidate (M == 1) there is no rank-1 column — the reference raises in
    # that case (geometry.h:345-355); here the home partition keeps all mass
    # via the fallback below, so skip the heuristic instead of letting JAX's
    # index clamping silently read column 0.
    if M >= 2:
        p = p.at[:, 0].set(2.0 * p[:, 1])
    s = jnp.sum(p, axis=1, keepdims=True)
    # All-caps-empty fallback: a finite k-th-distance ball that crosses NO
    # Voronoi bisector lies entirely in the home (rank-0) partition, so the
    # correct estimate puts all mass on rank 0 — scanning it suffices. The
    # reference falls back to uniform here (geometry.h:397-400), which makes
    # APS scan ~target*M partitions on well-separated data for no recall
    # benefit (measured: 182 of 276 candidates scanned where nprobe=2
    # reaches the target).
    home = jnp.zeros_like(p).at[:, 0].set(1.0)
    finite_r = jnp.isfinite(R) & (R > 0)
    fallback = jnp.where(finite_r, home, jnp.zeros_like(p))
    return jnp.where(s > 0, p / jnp.maximum(s, 1e-38), fallback)


def effective_dimension(x, max_sample: int = 16384) -> int:
    """Participation-ratio intrinsic dimension: (sum lambda)^2 / sum lambda^2
    of the sample covariance spectrum.

    The cap-volume recall model's concentration depends exponentially on
    dimension; real corpora (SIFT/DEEP/embeddings) live on low-dimensional
    manifolds, so using the ambient d makes the model overestimate recall
    and terminate early. Isotropic data returns ~d (reference behavior
    preserved); manifold data returns its intrinsic dimension. TPU-side
    improvement over the reference, which always uses ambient d
    (geometry.h:171)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float32)
    if x.shape[0] > max_sample:
        idx = np.random.default_rng(0).choice(x.shape[0], max_sample, replace=False)
        x = x[idx]
    xc = x - x.mean(axis=0, keepdims=True)
    cov = (xc.T @ xc) / max(x.shape[0] - 1, 1)
    lam = np.linalg.eigvalsh(cov.astype(np.float64))
    lam = np.clip(lam, 0.0, None)
    s1, s2 = lam.sum(), (lam**2).sum()
    if s2 <= 0:
        return x.shape[1]
    d_eff = int(round(s1 * s1 / s2))
    return int(np.clip(d_eff, 2, x.shape[1]))


def estimate_overlap(new_centroid, old_centroid, nbr_centroids):
    """Relative boundary shift toward each neighbor after a centroid moves
    (geometry.h:419-471). Used by maintenance refinement heuristics."""
    old_b = 0.5 * jnp.linalg.norm(nbr_centroids - old_centroid[None, :], axis=1)
    new_b = 0.5 * jnp.linalg.norm(nbr_centroids - new_centroid[None, :], axis=1)
    mean_old = jnp.maximum(jnp.mean(old_b), 1e-30)
    return jnp.abs(new_b - old_b) / mean_old
