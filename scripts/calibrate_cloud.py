"""Calibrate the cloud analog's photometric knobs against the artifact.

VERDICT r3 weak #3 / #2: the analog's luminance distribution disagreed
in SHAPE with disney-cloud-720p.exr — mean 1.86x brighter yet
in-silhouette median 2.7x dimmer — so the r3 gates (log2dev bounds
1.5 / 2.0) would pass nearly any cloud-shaped render.  This tool makes
the photometric legs mean something: it sweeps the shape knobs
(single-scatter albedo, density scale, path depth) on the TPU, exploits
the transport's exact linearity in the sun radiance to fit the sun
level analytically per config (sun* = argmin of the summed squared
log2 percentile deviations), and reports the resulting dev vector
against the artifact's percentiles.  The chosen knobs land in
parity.cloud_analog_scene's defaults; parity then gates with
mean <= 0.5, median/p75/p90 <= 1.0 log2dev.

Physics of the r3 failure mode it fixes: cloud-body brightness is
deep-multiple-scattering dominated, dying as albedo^bounces — at
albedo 0.96 and depth 32 the body is starved (0.96^32 ~ 0.27) while
the rim/tail (few bounces) is not, so no sun level can fit both.

Usage: python scripts/calibrate_cloud.py [--quick]
"""
import argparse
import json
import os
import sys
import time

os.environ["AVRT_PARITY_KEEP_PLATFORM"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from scripts import parity  # noqa: E402


def stats_for(img, ref, W, H):
    L = parity.lum(np.asarray(img))
    m = L > 1e-5
    if not m.any():
        return None
    ys, xs = np.nonzero(m)
    p = {q: float(np.percentile(L[m], q)) for q in (25, 50, 75, 90, 99)}
    return {
        "coverage": float(m.mean()),
        "centroid": (float(xs.mean() / W), float(ys.mean() / H)),
        "mean": float(L.mean()),
        "mean_clip_at": float(np.minimum(L, ref["max_lum"]).mean()),
        "p": p,
        "L": L,
    }


def devs_at(st, ref, m):
    """All gated deviations at sun multiplier m, exactly: quantiles
    commute with scaling; the clipped means are evaluated on the stored
    luminance image (min(m L, cap) is NOT linear in m — the r4 first
    sweep overestimated the mean dev ~2x by scaling it linearly)."""
    devs = {}
    for q in (50, 75, 90):
        devs[f"p{q}"] = float(abs(np.log2(
            st["p"][q] * m / ref["percentiles"][q])))
        devs[f"p{q}_signed"] = float(np.log2(
            st["p"][q] * m / ref["percentiles"][q]))
    mean_clip_m = float(np.minimum(st["L"] * m, ref["max_lum"]).mean())
    devs["mean"] = float(abs(np.log2(mean_clip_m / ref["mean_lum"])))
    devs["mean_signed"] = float(np.log2(mean_clip_m / ref["mean_lum"]))
    devs["p99_signed"] = float(np.log2(
        st["p"][99] * m / ref["percentiles"][99]))
    # robust (p99-capped) mean: BOTH sides capped at the reference's p99
    # — the bulk-energy comparison an MC-firefly tail can't blow
    cap = ref["percentiles"][99]
    ref_mean_cap = float(np.minimum(ref["L"], cap).mean())
    our_mean_cap = float(np.minimum(st["L"] * m, cap).mean())
    devs["mean_p99cap"] = float(abs(np.log2(our_mean_cap / ref_mean_cap)))
    return devs


def _score(devs):
    """Worst gate-normalized dev (capped-mean gate 0.5, percentiles 1.0)."""
    return max(devs["mean_p99cap"] / 0.5, devs["p50"], devs["p75"],
               devs["p90"])


def fit_sun(st, ref, base_sun):
    """Direct 1-D search for the sun multiplier minimizing the worst
    gate-normalized deviation (everything is exactly computable from the
    stored luminance image for any m, so the search is free)."""
    logc = np.log2(ref["percentiles"][50] / max(st["p"][50], 1e-12))
    grid = 2.0 ** np.linspace(logc - 3.0, logc + 3.0, 301)
    best_m, best = None, None
    for m in grid:
        d = devs_at(st, ref, float(m))
        if best is None or _score(d) < _score(best):
            best_m, best = float(m), d
    return base_sun * best_m, best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="few configs, low spp (smoke use)")
    ap.add_argument("--spp", type=int, default=12)
    ap.add_argument("--configs", default=None,
                    help="JSON list of knob dicts to sweep instead of "
                         "the default grid")
    args = ap.parse_args(argv)

    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    ref = parity.load_cloud_reference()
    print(json.dumps({"ref": {
        "coverage": ref["coverage"], "mean_lum": ref["mean_lum"],
        "percentiles": ref["percentiles"]}}))

    if args.configs:
        grid = json.loads(args.configs)
    else:
        grid = []
        albedos = [0.96, 0.99, 0.997, 1.0]
        depths = [32, 128]
        if args.quick:
            albedos, depths = [0.99, 1.0], [64]
        for albedo in albedos:
            for depth in depths:
                grid.append(dict(albedo=albedo, max_depth=depth, scale=0.10))

    W, H = 320, 180
    results = []
    for cfg in grid:
        # a cfg with an explicit "sun" is evaluated AS RENDERED (m = 1):
        # the in-render per-sample firefly clamp interacts nonlinearly
        # with the sun level (a 4^k RR survivor hidden below the clamp
        # at a low sun emerges clamp-bound at a higher one), so the
        # linear-scaling shortcut misestimates the tail — final sun
        # selection must use real renders at candidate levels
        base_sun = cfg.pop("sun", None)
        fit = base_sun is None
        if fit:
            base_sun = 1.15
        t0 = time.time()
        scene, _ = parity.cloud_analog_scene(
            ref, W=W, H=H, spp=args.spp, sun=base_sun, **cfg)
        img, _ = render_mod.render_regen(scene, stochastic_filter=True)
        st = stats_for(img, ref, W, H)
        if st is None:
            print(json.dumps({"cfg": cfg, "error": "black image"}))
            continue
        if fit:
            sun_star, devs = fit_sun(st, ref, base_sun)
        else:
            sun_star, devs = base_sun, devs_at(st, ref, 1.0)
        score = _score(devs)
        row = {"cfg": dict(cfg, sun=base_sun), "sun_star": round(sun_star, 4),
               "devs_at_sun_star": {k: round(v, 3) for k, v in devs.items()},
               "score": round(score, 3),
               "stats_at_base_sun": {
                   "coverage": round(st["coverage"], 4),
                   "centroid": [round(c, 4) for c in st["centroid"]],
                   "mean_clip": round(st["mean_clip_at"], 5),
                   "p": {k: round(v, 5) for k, v in st["p"].items()}},
               "seconds": round(time.time() - t0, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    if results:
        best = min(results, key=lambda r: r["score"])
        print(json.dumps({"best": best["cfg"], "sun": best["sun_star"],
                          "score": best["score"]}))


if __name__ == "__main__":
    main()
