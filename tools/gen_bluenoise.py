"""Generate the blue-noise dither table via void-and-cluster.

The reference ships a 128x128x4-layer RGBA16 blue-noise texture
(`Data/BlueNoise128_RGBA16.dat`, loaded in `Core/Sampling/GenericSampler.cpp:
10-54`) used to Cranley-Patterson-rotate the first sampling dimensions and to
dither the final frame.  We cannot copy that data file, so this script
*generates* an equivalent table with Ulichney's void-and-cluster method
(toroidal Gaussian energy, sigma=1.9) and writes it to
``raytracer_tpu/sampler/bluenoise128.npy`` as uint16 (same 16-bit depth as the
reference's RGBA16 layers).

Run once: ``python tools/gen_bluenoise.py`` (~seconds per layer).
"""

import os
import sys

import numpy as np

SIZE = 128
LAYERS = 4
SIGMA = 1.9


def _wrapped_gaussian(size: int, sigma: float) -> np.ndarray:
    """Toroidal Gaussian energy kernel centered at (0, 0)."""
    d = np.arange(size)
    d = np.minimum(d, size - d).astype(np.float64)
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    return np.exp(-d2 / (2.0 * sigma * sigma))


def _gen_layer(rng: np.random.Generator, size: int = SIZE) -> np.ndarray:
    n = size * size
    kernel = _wrapped_gaussian(size, SIGMA)
    ys, xs = np.mgrid[0:size, 0:size]

    def add_energy(energy, y, x, sign):
        energy += sign * kernel[(ys - y) % size, (xs - x) % size]

    # --- phase 0: prototype pattern, relax cluster->void until stable
    n0 = n // 10
    binary = np.zeros((size, size), bool)
    flat = rng.choice(n, n0, replace=False)
    binary[np.unravel_index(flat, (size, size))] = True
    energy = np.zeros((size, size))
    for y, x in zip(*np.nonzero(binary)):
        add_energy(energy, y, x, +1.0)
    for _ in range(n):  # bounded relaxation
        e_ones = np.where(binary, energy, -np.inf)
        cy, cx = np.unravel_index(np.argmax(e_ones), (size, size))
        binary[cy, cx] = False
        add_energy(energy, cy, cx, -1.0)
        e_zeros = np.where(binary, np.inf, energy)
        vy, vx = np.unravel_index(np.argmin(e_zeros), (size, size))
        if (vy, vx) == (cy, cx):  # stable: tightest cluster is largest void
            binary[cy, cx] = True
            add_energy(energy, cy, cx, +1.0)
            break
        binary[vy, vx] = True
        add_energy(energy, vy, vx, +1.0)

    rank = np.full((size, size), -1, np.int64)
    proto = binary.copy()
    proto_energy = energy.copy()

    # --- phase 1: rank initial points by removing the tightest cluster
    b = proto.copy()
    e = proto_energy.copy()
    for r in range(n0 - 1, -1, -1):
        e_ones = np.where(b, e, -np.inf)
        cy, cx = np.unravel_index(np.argmax(e_ones), (size, size))
        b[cy, cx] = False
        add_energy(e, cy, cx, -1.0)
        rank[cy, cx] = r

    # --- phase 2: fill remaining pixels at the largest void
    b = proto.copy()
    e = proto_energy.copy()
    for r in range(n0, n):
        e_zeros = np.where(b, np.inf, e)
        vy, vx = np.unravel_index(np.argmin(e_zeros), (size, size))
        b[vy, vx] = True
        add_energy(e, vy, vx, +1.0)
        rank[vy, vx] = r

    assert (rank >= 0).all()
    return ((rank.astype(np.float64) + 0.5) / n * 65535.0).astype(np.uint16)


def main():
    out = os.path.join(
        os.path.dirname(__file__), "..", "raytracer_tpu", "sampler", "bluenoise128.npy"
    )
    rng = np.random.default_rng(20260818)
    layers = np.stack([_gen_layer(rng) for _ in range(LAYERS)], axis=-1)
    np.save(out, layers)
    print(f"wrote {out}: {layers.shape} {layers.dtype}")


if __name__ == "__main__":
    sys.exit(main())
