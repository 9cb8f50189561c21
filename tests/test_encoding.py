import jax.numpy as jnp
import numpy as np

from voidin_tpu.core import encoding


def _random_unit(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_octahedral_roundtrip():
    n = _random_unit(4096)
    dec = np.asarray(encoding.decode_octahedral_32(encoding.encode_octahedral_32(jnp.asarray(n))))
    dots = np.sum(dec * n, axis=-1)
    # 16 bits per component => sub-degree accuracy
    assert dots.min() > 0.999999, dots.min()


def test_octahedral_axes_exact():
    # NOTE: (0,0,-1) is excluded: with WGSL sign(0)==0 semantics the fold maps
    # -Z onto the center texel (+Z) — the reference encoder has the same
    # singularity (encoding.wgsl:6-10), and real shading normals never hit it
    # exactly.
    axes = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0]],
        np.float32,
    )
    dec = np.asarray(encoding.decode_octahedral_32(encoding.encode_octahedral_32(jnp.asarray(axes))))
    np.testing.assert_allclose(dec, axes, atol=1e-4)


def test_pack2x16float_roundtrip():
    rng = np.random.default_rng(1)
    uv = rng.uniform(-8, 8, size=(1024, 2)).astype(np.float32)
    out = np.asarray(encoding.unpack2x16float(encoding.pack2x16float(jnp.asarray(uv))))
    np.testing.assert_allclose(out, uv, rtol=2e-3, atol=2e-3)


def test_pack2x16float_layout():
    # x occupies the low 16 bits (WGSL pack2x16float contract).
    p = int(encoding.pack2x16float(jnp.asarray([1.0, 0.0], jnp.float32)))
    assert p & 0xFFFF == 0x3C00  # f16 1.0
    assert p >> 16 == 0
