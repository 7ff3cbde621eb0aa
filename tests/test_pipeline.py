"""Seismic pipeline tests: ISF parsing, xcorr alignment, catalog join,
fleet generation."""

import numpy as np
import pytest

from gprf_tpu.data.pipeline.align import (
    WINDOW_START_IDX,
    align,
    align_waves,
    coherency,
    extract_patches,
    my_xc,
    xcorr_valid,
)
from gprf_tpu.data.pipeline.catalog import join_and_sort, scraped_to_evid_dict
from gprf_tpu.data.pipeline.isf import ev_from_line, fakescrape, isc_query_url


def test_my_xc_matches_naive(rng):
    a = rng.normal(size=50)
    b = rng.normal(size=300)
    xc = my_xc(a, b)
    assert len(xc) == 251
    a_normed = a / np.linalg.norm(a)
    for i in [0, 13, 100, 250]:
        w = b[i : i + 50]
        expect = a_normed @ (w / np.linalg.norm(w))
        assert np.isclose(xc[i], expect, rtol=1e-10)


def test_xcorr_finds_embedded_template(rng):
    a = rng.normal(size=40)
    b = rng.normal(size=400) * 0.05
    b[123 : 123 + 40] += a
    xcmax, offset, _ = xcorr_valid(a, b)
    assert offset == 123
    assert xcmax > 0.9


def test_align_recovers_shift(rng):
    # two waveforms that are shifted copies of the same source
    src = rng.normal(size=400)
    w1 = np.concatenate([np.zeros(0), src])[:350]
    shift = 7
    w2 = np.concatenate([np.zeros(shift), src])[:350]
    xcmax1, xcmax2, align1, align2, adj1, adj2 = align(w1, w2)
    assert xcmax1 > 0.95
    # w1's window appears `shift` samples later in w2
    assert align1 == WINDOW_START_IDX + shift
    assert adj1 == -shift


def test_align_waves_improves_coherency(rng):
    src = rng.normal(size=200)
    waves = []
    true_shifts = [0, 4, -3, 7, 2]
    for s in true_shifts:
        w = rng.normal(size=400) * 0.05
        w[85 + s : 85 + s + 200] += src
        waves.append(w)

    class _R:
        def permutation(self, n):
            return np.random.permutation(n)

        def randn(self, *a):
            return np.random.randn(*a)

    np.random.seed(0)
    c0 = coherency(waves, np.ones(5) * 85.0)
    c, widxs = align_waves(waves, nruns=3, threshold=0.3, rng=np.random)
    assert c >= c0 - 1e-9
    assert c > 0.5
    # recovered relative shifts match the true ones
    rel = widxs - widxs[0]
    expect = np.array(true_shifts) - true_shifts[0]
    np.testing.assert_allclose(rel, expect, atol=1.0)


def test_ev_from_line_parses_isf():
    # synthetic fixed-width ISF origin line with known fields
    line = (
        "2009/04/06 01:32:39.00   0.50  0.30  42.3340   13.3340  2.0   1.5  90  8.8f   1.0"
        + " " * 30
    )
    line = line[:113] + "a" + "    ISCTEST  " + " 123456"
    source, h = ev_from_line(line)
    (ts, time_err, time_rms, lon, lat, smaj, smin, strike, depth, depth_err,
     method, src2, iscid) = h
    assert np.isclose(lat, 42.334)
    assert np.isclose(lon, 13.334)
    assert np.isclose(time_err, 0.50)
    assert np.isclose(smaj, 2.0)
    assert np.isclose(smin, 1.5)
    assert strike == 90
    assert ts > 1.2e9  # april 2009 epoch seconds


def test_fakescrape_heuristic():
    # mb 3 -> 50 km, mb 6 -> 6.25 km (error_km = 400 / 2**mb)
    _, _, smaj3, _, _, _, _ = fakescrape(0, 0, 10, 3.0)
    _, _, smaj6, _, _, _, _ = fakescrape(0, 0, 10, 6.0)
    assert np.isclose(smaj3, 50.0)
    assert np.isclose(smaj6, 6.25)


def test_isc_query_url():
    url = isc_query_url(130.5, -3.25, 1.3e9)
    assert "ctr_lat=-3.25" in url and "ctr_lon=130.50" in url
    assert "out_format=ISF" in url


def test_catalog_join_and_sort(tmp_path, rng):
    # two scraped CSVs sharing some evids, one outlier
    def write_csv(path, rows):
        with open(path, "w") as f:
            for r in rows:
                f.write(", ".join("%f" % v for v in r) + "\n")

    # row = idx, evid, ts, terr, lon, lat, smaj, smin, strike, depth, derr
    isc_rows, idc_rows = [], []
    for k in range(10):
        lon, lat = 120 + k, -5 + 0.5 * k
        base = [k, 1000 + k, 1e9 + k, 0.5, lon, lat, 20.0, 15.0, 0, 30.0, 2.0]
        isc_rows.append(base)
        idc = list(base)
        if k == 3:
            idc[4] += 10.0  # ~1100 km disagreement >> 3*smaj -> outlier
        else:
            idc[4] += 0.05
        idc_rows.append(idc)
    # an isc-only evid (no idc match)
    isc_rows.append([99, 2000, 1e9, 0.5, 140.0, 0.0, 20.0, 15.0, 0, 30.0, 2.0])
    write_csv(tmp_path / "isc.txt", isc_rows)
    write_csv(tmp_path / "idc.txt", idc_rows)

    isc_d = scraped_to_evid_dict(str(tmp_path / "isc.txt"))
    idc_d = scraped_to_evid_dict(str(tmp_path / "idc.txt"))
    sorted_idc, sorted_isc, evids = join_and_sort(isc_d, idc_d)
    assert len(evids) == 9  # 10 joined minus 1 outlier
    assert 2000 not in evids


def test_fleet_generation(tmp_path):
    from gprf_tpu.analysis.fleet import (
        eighty_run_params,
        fitc_run_params,
        gen_runs,
        truegp_run_params,
    )

    runs, by_key = eighty_run_params()
    assert len(runs) == 10  # 6 local + 4 gprf
    runs, by_key = truegp_run_params()
    assert any(k.startswith("FITC") for k in by_key)
    runs, _ = fitc_run_params()
    assert len(runs) > 30
    gen_runs(out_dir=str(tmp_path))
    txt = (tmp_path / "run_truegp.sh").read_text()
    assert "gprf_tpu.cli.gprfopt" in txt
    assert "--ntrain=10000" in txt
    assert "--maxsec=18000" in txt


def test_vis_points_renders(tmp_path, rng):
    import pytest

    pytest.importorskip("matplotlib")
    from gprf_tpu.analysis.plots import vis_points

    d = tmp_path / "run"
    d.mkdir()
    for step in range(2):
        np.save(d / ("step_%05d_X.npy" % step), rng.uniform(size=(50, 2)))
    written = vis_points(str(d), sdata=None, make_movie=False)
    assert len(written) == 2
    assert all(w.endswith(".png") for w in written)
