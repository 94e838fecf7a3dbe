"""Binary segmentation metrics (the vendored-medpy equivalent).

Reference: kwatsch/medpy_metrics.py (dc:36, jc:86, precision:121,
recall:169, sensitivity/specificity:217-229, hd:315, hd95:363, assd:411,
asd:465, ravd:574, volume_correlation:661). Implemented from the metric
definitions with scipy distance transforms; surface distances use the
same "erode-by-binary-structure → border voxels → EDT" construction.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import ndimage


def _as_bool(x) -> np.ndarray:
    return np.atleast_1d(np.asarray(x).astype(bool))


def dc(result, reference) -> float:
    """Dice coefficient: 2|A∩B| / (|A| + |B|)."""
    r, g = _as_bool(result), _as_bool(reference)
    inter = np.count_nonzero(r & g)
    denom = np.count_nonzero(r) + np.count_nonzero(g)
    return 2.0 * inter / denom if denom else 0.0


def jc(result, reference) -> float:
    """Jaccard index: |A∩B| / |A∪B|."""
    r, g = _as_bool(result), _as_bool(reference)
    union = np.count_nonzero(r | g)
    return np.count_nonzero(r & g) / union if union else 0.0


def precision(result, reference) -> float:
    r, g = _as_bool(result), _as_bool(reference)
    pos = np.count_nonzero(r)
    return np.count_nonzero(r & g) / pos if pos else 0.0


def recall(result, reference) -> float:
    r, g = _as_bool(result), _as_bool(reference)
    pos = np.count_nonzero(g)
    return np.count_nonzero(r & g) / pos if pos else 0.0


def sensitivity(result, reference) -> float:
    return recall(result, reference)


def specificity(result, reference) -> float:
    r, g = _as_bool(result), _as_bool(reference)
    neg = np.count_nonzero(~g)
    return np.count_nonzero(~r & ~g) / neg if neg else 0.0


def ravd(result, reference) -> float:
    """Relative absolute volume difference (|A|-|B|)/|B|."""
    r, g = _as_bool(result), _as_bool(reference)
    vol_g = np.count_nonzero(g)
    if vol_g == 0:
        raise RuntimeError("reference is empty; RAVD undefined")
    return (np.count_nonzero(r) - vol_g) / float(vol_g)


def _surface_distances(result, reference, voxelspacing=None,
                       connectivity: int = 1) -> np.ndarray:
    """Distances of result border voxels to the reference surface
    (reference: medpy_metrics.py:1205-1238 construction)."""
    r, g = _as_bool(result), _as_bool(reference)
    if voxelspacing is not None:
        voxelspacing = np.atleast_1d(
            np.asarray(voxelspacing, np.float64))
        if voxelspacing.size == 1:
            voxelspacing = np.repeat(voxelspacing, r.ndim)
    if not np.count_nonzero(r):
        raise RuntimeError("result is empty; surface distance undefined")
    if not np.count_nonzero(g):
        raise RuntimeError("reference is empty; surface distance undefined")
    footprint = ndimage.generate_binary_structure(r.ndim, connectivity)
    r_border = r ^ ndimage.binary_erosion(r, structure=footprint,
                                          iterations=1)
    g_border = g ^ ndimage.binary_erosion(g, structure=footprint,
                                          iterations=1)
    dt = ndimage.distance_transform_edt(~g_border, sampling=voxelspacing)
    return dt[r_border]


def hd(result, reference, voxelspacing=None, connectivity: int = 1) -> float:
    """Symmetric Hausdorff distance."""
    hd1 = _surface_distances(result, reference, voxelspacing,
                             connectivity).max()
    hd2 = _surface_distances(reference, result, voxelspacing,
                             connectivity).max()
    return float(max(hd1, hd2))


def surface_distance_pair(result, reference, voxelspacing=None,
                          connectivity: int = 1
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Both one-sided surface-distance sets (result→reference,
    reference→result). The EDTs + erosions dominate the cost of every
    symmetric metric — compute them ONCE and derive hd/hd95/assd from
    the pair instead of re-running them per metric."""
    d1 = _surface_distances(result, reference, voxelspacing, connectivity)
    d2 = _surface_distances(reference, result, voxelspacing, connectivity)
    return d1, d2


def hd95(result, reference, voxelspacing=None,
         connectivity: int = 1) -> float:
    """95th-percentile symmetric Hausdorff distance."""
    d1, d2 = surface_distance_pair(result, reference, voxelspacing,
                                   connectivity)
    return hd95_from_pair(d1, d2)


def hd95_from_pair(d1: np.ndarray, d2: np.ndarray) -> float:
    return float(np.percentile(np.hstack((d1, d2)), 95))


def asd(result, reference, voxelspacing=None, connectivity: int = 1) -> float:
    """Average (one-sided) surface distance."""
    return float(_surface_distances(result, reference, voxelspacing,
                                    connectivity).mean())


def assd(result, reference, voxelspacing=None,
         connectivity: int = 1) -> float:
    """Average symmetric surface distance."""
    d1, d2 = surface_distance_pair(result, reference, voxelspacing,
                                   connectivity)
    return assd_from_pair(d1, d2)


def assd_from_pair(d1: np.ndarray, d2: np.ndarray) -> float:
    return float(np.mean((d1.mean(), d2.mean())))


def volume_correlation(results, references) -> Tuple[float, float]:
    """Pearson r (and p-value) between per-case foreground volumes."""
    from scipy.stats import pearsonr

    vols_r = [np.count_nonzero(_as_bool(r)) for r in results]
    vols_g = [np.count_nonzero(_as_bool(g)) for g in references]
    r, p = pearsonr(vols_r, vols_g)
    return float(r), float(p)
