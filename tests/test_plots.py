"""Plot exports (utils/plots.py) — files exist, KL/MSE numbers sane."""

import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.utils import plots


def test_hist_vs_pdf_1d(tmp_path):
    rng = np.random.RandomState(0)
    x = rng.normal(0.0, 0.3, 20000)
    p = plots.export_hist_vs_pdf_1d(
        x, lambda t: np.exp(-t**2 / (2 * 0.09)) / np.sqrt(2 * np.pi * 0.09),
        str(tmp_path / "h1.png"), lo=-1.5, hi=1.5, title="gauss",
    )
    assert (tmp_path / "h1.png").exists(), p


def test_export_2d(tmp_path):
    rng = np.random.RandomState(1)
    x = rng.normal(0, 0.3, (10000, 2))
    plots.export_2d(x, str(tmp_path / "h2.png"), title="2d")
    assert (tmp_path / "h2.png").exists()


def test_pdf_comparison_and_kl(tmp_path):
    rng = np.random.RandomState(2)
    res = 40
    c = (np.arange(res) + 0.5) / res * 2 - 1
    gx, gy = np.meshgrid(c, c, indexing="ij")
    p = np.exp(-(gx**2 + gy**2) / 0.1)
    plots.export_pdf_comparison(p * 1.05, p, str(tmp_path / "cmp"))
    assert (tmp_path / "cmp_pdf_comparison.png").exists()

    x = rng.normal(0, np.sqrt(0.05), (1 << 16, 2))
    path, kl = plots.export_samples_vs_pdf(x, p, str(tmp_path / "svp"))
    assert (tmp_path / "svp_samples_vs_pdf.png").exists()
    assert 0 <= kl < 0.05, kl  # matched distribution -> tiny KL

    # mismatched distribution -> clearly larger KL
    x_bad = rng.normal(0.5, np.sqrt(0.05), (1 << 16, 2))
    _, kl_bad = plots.export_samples_vs_pdf(x_bad, p, str(tmp_path / "svp2"))
    assert kl_bad > 5 * max(kl, 1e-4), (kl, kl_bad)


def test_render_diff(tmp_path):
    rng = np.random.RandomState(3)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = a + 0.01
    path, mse = plots.export_render_diff(a, b, str(tmp_path / "rd"))
    assert (tmp_path / "rd_render_diff.png").exists()
    assert np.isclose(mse, 1e-4, rtol=1e-3)
