#!/usr/bin/env python3
"""Generate golden kernel outputs from the reference implementation.

Dev-only tool: imports the reference's pure-numpy modules (stubbing heavy
deps like matplotlib) and evaluates each kernel on a deterministic battery
of inputs. Output JSON is committed at src/test/resources/golden_kernels.json
and consumed by KernelGoldenSpec to pin exact semantic parity.
"""
import json
import sys
import types

import numpy as np

# Stub GUI deps before importing the reference package.
for mod in ["matplotlib", "matplotlib.pyplot", "pandas", "astropy",
            "astropy.coordinates", "astropy.units", "tqdm", "requests",
            "bs4", "sklearn", "sklearn.decomposition", "keras"]:
    sys.modules.setdefault(mod, types.ModuleType(mod))
sys.modules["sklearn.decomposition"].PCA = object
sys.modules["sklearn"].decomposition = sys.modules["sklearn.decomposition"]


# scipy is absent in this container; provide the two moments the reference
# uses with scipy.stats' default semantics (biased, Fisher kurtosis).
def _skew(x):
    x = np.asarray(x, dtype=float)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    return m3 / m2 ** 1.5


def _kurtosis(x):
    x = np.asarray(x, dtype=float)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m4 = ((x - m) ** 4).mean()
    return m4 / m2 ** 2 - 3.0


for mod in ["scipy", "scipy.stats"]:
    sys.modules.setdefault(mod, types.ModuleType(mod))
sys.modules["scipy.stats"].kurtosis = _kurtosis
sys.modules["scipy.stats"].skew = _skew
sys.modules["scipy"].stats = sys.modules["scipy.stats"]

sys.path.insert(0, "/root/reference")

from lcc.utils import data_analysis as da  # noqa: E402
from lcc.stars_processing.utilities.sax import SAX  # noqa: E402


def arr(x):
    return [None if (isinstance(v, float) and np.isnan(v)) else
            ("inf" if v == np.inf else ("-inf" if v == -np.inf else float(v)))
            for v in np.asarray(x, dtype=float)]


rng = np.random.RandomState(42)

cases = {"paa": [], "normalize": [], "abbe": [], "ekvi_paa": [],
         "fix_missing": [], "variogram": [], "histogram": [],
         "compute_bins": [], "sax_word": [], "mindist": [],
         "variogram_slope": [], "curve_density": [], "curve_abbe": []}

series = []
for n in [5, 7, 10, 33, 100, 257]:
    series.append(rng.rand(n) * 10)
t = np.sort(rng.rand(200) * 300)
mag_sin = 15 + np.sin(t / 20.0) + rng.normal(0, 0.1, 200)
mag_exp = 15 + np.exp(t / 300.0) + rng.normal(0, 0.1, 200)
# irregular sampling with a big gap -> empty ekvi bins -> NaNs to fix
t_gap = np.sort(np.concatenate([rng.rand(60) * 50, 200 + rng.rand(60) * 50]))
mag_gap = 14 + np.cos(t_gap / 10.0) + rng.normal(0, 0.05, len(t_gap))

for x in series:
    for bins in [1, 3, 5, len(x) // 2 or 1, len(x), len(x) + 7]:
        out, _ = da.to_PAA(x, bins)
        cases["paa"].append({"x": arr(x), "bins": bins, "out": arr(out)})
    cases["normalize"].append({"x": arr(x), "out": arr(da.normalize(x))})
    cases["abbe"].append({"x": arr(x), "n": len(x),
                          "out": float(da.abbe(x.copy(), len(x)))})

cases["normalize"].append({"x": arr(np.full(9, 3.14)),
                           "out": arr(da.normalize(np.full(9, 3.14)))})

for (tt, yy) in [(t, mag_sin), (t, mag_exp), (t_gap, mag_gap)]:
    for bins in [None, 10, 37, len(tt)]:
        xa, ya = da.to_ekvi_PAA(tt, yy, bins=bins)
        cases["ekvi_paa"].append({"t": arr(tt), "y": arr(yy),
                                  "bins": bins, "xa": arr(xa), "ya": arr(ya)})
    for bins in [10, 20]:
        vx, vy = da.variogram(tt, yy, bins=bins)
        cases["variogram"].append({"t": arr(tt), "y": arr(yy), "bins": bins,
                                   "vx": arr(vx), "vy": arr(vy)})
    for bn in [10, 15]:
        h, edges = da.histogram(tt, yy, bins_num=bn)
        cases["histogram"].append({"t": arr(tt), "y": arr(yy), "bins_num": bn,
                                   "hist": arr(h), "edges": arr(edges)})
    for dpb in [10.0, 30.0]:
        cases["compute_bins"].append({"t": arr(tt), "days_per_bin": dpb,
                                      "out": int(da.compute_bins(tt, dpb))})
        x_, y_ = da.variogram(tt, yy, bins=da.compute_bins(tt, dpb))
        slope = float(np.polyfit(x_, y_, 1)[0])
        cases["variogram_slope"].append({"t": arr(tt), "y": arr(yy),
                                         "days_per_bin": dpb, "out": slope})
    xr = da.to_ekvi_PAA(tt, yy)[0]
    cases["curve_density"].append({"t": arr(tt), "y": arr(yy),
                                   "out": float(len(xr) / (xr.max() - xr.min()))})
    for bins in [None, 25]:
        xx = da.to_ekvi_PAA(tt, yy, bins)[1] if bins else yy
        cases["curve_abbe"].append({"t": arr(tt), "y": arr(yy), "bins": bins,
                                    "out": float(da.abbe(xx.copy(), len(tt)))})

# fix_missing direct cases
fm_inputs = [
    ([1., 2, 3, 4, 5, 6], [np.nan, np.nan, 3, np.nan, 5, np.nan]),
    ([1., 2, 4, 8, 9, 10, 11], [1, np.nan, np.nan, 4, np.nan, 6, 7]),
    ([1., 2, 3], [np.nan, np.nan, np.nan]),
    ([1., 3, 6, 10], [5, np.nan, np.nan, np.nan]),
]
for xx, yy in fm_inputs:
    for rb in [True, False]:
        if rb is False and np.isnan(yy).all():
            continue  # reference raises IndexError here (all values deleted)
        fx, fy = da.fix_missing(np.array(xx), np.array(yy),
                                replace_at_borders=rb)
        cases["fix_missing"].append({"x": arr(xx), "y": arr(yy),
                                     "replace_at_borders": rb,
                                     "fx": arr(fx), "fy": arr(fy)})

# SAX words + mindist
for x in series:
    for ws in [4, 8, 16]:
        for alpha in [3, 7, 10, 20]:
            sax = SAX(ws, alpha)
            word, _ = sax.to_letter_rep(x)
            cases["sax_word"].append({"x": arr(x), "word_size": ws,
                                      "alphabet": alpha, "word": word,
                                      "scaling": float(sax.scaling_factor)})
words = [("abcddcba", "aaaabbbb"), ("jihgfedc", "ajajajaj"),
         ("accaacca", "bbbbbbbb")]
for a, b in words:
    for alpha in [10, 12]:
        sax = SAX(len(a), alpha, scaling_factor=2.5)
        cases["mindist"].append({"a": a, "b": b, "alphabet": alpha,
                                 "scaling": 2.5,
                                 "out": float(sax.compare_strings(a, b))})

out_path = "src/test/resources/golden_kernels.json"
with open(out_path, "w") as f:
    json.dump(cases, f)
print(f"wrote {out_path}: " +
      ", ".join(f"{k}={len(v)}" for k, v in cases.items()))

# ---- comparative descriptors (SAX compare paths) ----
from lcc.entities.light_curve import LightCurve  # noqa: E402
from lcc.stars_processing.descriptors.curves_shape_descr import CurvesShapeDescr  # noqa: E402
from lcc.stars_processing.descriptors.hist_shape_descr import HistShapeDescr  # noqa: E402
from lcc.stars_processing.descriptors.variogram_shape_descr import VariogramShapeDescr  # noqa: E402


class FakeStar:
    def __init__(self, t, m):
        self.lightCurve = LightCurve([t, m, np.zeros(len(t))])


stars = [FakeStar(t, mag_sin), FakeStar(t_gap, mag_gap),
         FakeStar(np.sort(rng.rand(150) * 420),
                  15 + np.sin(np.arange(150) / 5.0) + rng.normal(0, 0.3, 150)),
         FakeStar(np.sort(rng.rand(80) * 100),
                  14 + rng.normal(0, 0.4, 80))]
templates = stars[2:]

cases["curves_shape"] = []
for slide in [0.25, None]:
    for meth in ["average", "closest", "best2"]:
        d = CurvesShapeDescr(templates, days_per_bin=30.0, alphabet_size=10,
                             slide=slide, meth=meth)
        for si, s in enumerate(stars[:2]):
            cases["curves_shape"].append({
                "star": si, "slide": slide, "meth": meth,
                "out": float(d.getFeatures(s))})

cases["hist_shape"] = []
cases["vario_shape"] = []
for meth in ["average", "closest"]:
    hd = HistShapeDescr(templates, bins=10, alphabet_size=10, meth=meth)
    vd = VariogramShapeDescr(templates, bins=10, alphabet_size=10, meth=meth)
    for si, s in enumerate(stars[:2]):
        cases["hist_shape"].append({"star": si, "meth": meth,
                                    "out": float(hd.getFeatures(s))})
        cases["vario_shape"].append({"star": si, "meth": meth,
                                     "out": float(vd.getFeatures(s))})

# serialize the star/template curves (post-_cleanLC, so rounding included)
cases["comp_stars"] = [{"t": arr(s.lightCurve.time), "m": arr(s.lightCurve.mag)}
                       for s in stars]

with open(out_path, "w") as f:
    json.dump(cases, f)
print("comparative goldens: curves_shape=%d hist=%d vario=%d" %
      (len(cases["curves_shape"]), len(cases["hist_shape"]),
       len(cases["vario_shape"])))

# ---- CurveDescr + moment descriptors ----
from lcc.stars_processing.descriptors.curve_descr import CurveDescr
from lcc.stars_processing.descriptors.kurtosis_desc import KurtosisDescr
from lcc.stars_processing.descriptors.skewness_desc import SkewnessDescr

cases["curve_descr"] = []
# height=N crashes in the reference under modern numpy (in-place float
# subtract on the int array it makes via round()) — golden only height=None.
for height in [None]:
    cd = CurveDescr(bins=20, height=height)
    coords = cd.getSpaceCoords(stars[:2])
    for si, c in enumerate(coords):
        cases["curve_descr"].append({"star": si, "bins": 20, "height": height,
                                     "out": arr(c)})

cases["moment_descr"] = []
for si, s in enumerate(stars[:2]):
    for bins in [None, 30]:
        kd = KurtosisDescr(bins=bins)
        sd = SkewnessDescr(bins=bins)
        cases["moment_descr"].append({
            "star": si, "bins": bins,
            "kurtosis": float(kd.getFeatures(s)),
            "skewness": float(sd.getFeatures(s))})

with open(out_path, "w") as f:
    json.dump(cases, f)
print("descr goldens: curve=%d moment=%d" %
      (len(cases["curve_descr"]), len(cases["moment_descr"])))
