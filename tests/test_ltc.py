"""LTC table validation.

The shipped tables (voidin_tpu/assets/ltc_tables.npz) come from our own
GGX->LTC fit (tools/fit_ltc.py). When the reference renderer's tables are
available (read-only mount), compare against them as an oracle; otherwise
check structural invariants only.
"""

import os
import re

import numpy as np
import pytest

from voidin_tpu.scene.ltc import load_ltc_tables

_REF = "/root/reference/crates/pools/src/ltc_matrix.raw"


def _ref_tables():
    src = open(_REF).read()

    def grab(name):
        m = re.search(rf"pub const {name}: &\[f32\] = &\[(.*?)\];", src, re.S)
        vals = [float(x) for x in m.group(1).replace("\n", " ").split(",") if x.strip()]
        return np.array(vals, np.float32).reshape(64, 64, 4)

    return grab("LTC1"), grab("LTC2")


def test_tables_present_and_finite():
    l1, l2 = load_ltc_tables()
    assert l1.shape == (64, 64, 4) and l2.shape == (64, 64, 4)
    assert np.isfinite(l1).all() and np.isfinite(l2).all()
    # magnitude in (0, 1]; sphere-clip factor in [0, 1]
    assert (l2[..., 0] > 0).all() and (l2[..., 0] <= 1.001).all()
    assert (l2[..., 3] >= -1e-3).all() and (l2[..., 3] <= 1.001).all()


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not mounted")
def test_tables_match_reference_fit():
    """Our fitted tables should agree with the published LTC data."""
    l1, l2 = load_ltc_tables()
    r1, r2 = _ref_tables()

    def norm(t):
        n = np.sqrt((t[..., :4] ** 2).sum(-1) + 1.0)
        return t / n[..., None]

    e1 = np.abs(norm(r1) - norm(l1)).mean()
    assert e1 < 0.06, f"LTC1 matrix divergence {e1}"
    e_mag = np.abs(r2[..., 0] - l2[..., 0]).mean()
    assert e_mag < 0.04, f"magnitude divergence {e_mag}"
    e_sph = np.abs(r2[..., 3] - l2[..., 3]).mean()
    assert e_sph < 0.02, f"sphere-clip divergence {e_sph}"
