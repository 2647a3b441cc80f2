"""Per-page label-grid scoring kernels — the deterministic payload
analog of the reference's Mask2Former segmentation pipeline.

A page's token-label array (functions/text.token_labels) is reshaped to
a GRID_H x W int grid; from there every kernel is a line-faithful NumPy
port of the reference's pixel semantics:

- run_length_encoding          modules/process_data.py:77-89
- get_road_pixels_per_column   modules/process_data.py:91-100
- find_peaks                   scipy.signal.find_peaks subset (distance,
                               prominence) — scipy is not available in
                               this environment, so the engine carries
                               the published algorithm (local maxima with
                               plateau midpoints, prominence bases,
                               highest-priority-first distance pruning),
                               including scipy's ValueError on
                               distance < 1 (the reference relies on the
                               surrounding try/except to turn that into
                               an error=True row, process_data.py:298).
- find_road_centre             modules/process_data.py:112-120
- crop_panoramic_images        modules/process_data.py:198-218
- crop_panoramic_images_roads  modules/process_data.py:123-195 (all four
                               wraparound cases)
- get_GVI                      modules/process_data.py:221-232
- process_labels               modules/process_data.py:235-300 flag
                               semantics: [gvi, is_panoramic, missing,
                               error] with pano bottom-20% crop and the
                               25% wraparound widening.
"""

from __future__ import annotations

import numpy as np

GRID_H = 16
ROAD = 0
VEGETATION = 8


def to_grid(labels: np.ndarray, height: int = GRID_H) -> np.ndarray | None:
    """1-D label array -> (height, W) grid, truncating the remainder.
    Returns None when there are fewer tokens than one full column."""
    labels = np.asarray(labels, dtype=np.int32)
    w = len(labels) // height
    if w == 0:
        return None
    return labels[: height * w].reshape(height, w)


def run_length_encoding(in_array):
    image_array = np.asarray(in_array)
    length = len(image_array)
    if length == 0:
        return (None, None)
    pairwise_unequal = image_array[1:] != image_array[:-1]
    change_points = np.append(np.where(pairwise_unequal), length - 1)
    run_lengths = np.diff(np.append(-1, change_points))
    return (run_lengths, image_array[change_points])


def get_road_pixels_per_column(prediction: np.ndarray) -> np.ndarray:
    road_pixels = prediction == ROAD
    road_pixels_per_col = np.zeros(road_pixels.shape[1])
    for i in range(road_pixels.shape[1]):
        run_lengths, values = run_length_encoding(road_pixels[:, i])
        road_pixels_per_col[i] = run_lengths[values.nonzero()].max(initial=0)
    return road_pixels_per_col


def _local_maxima(x: np.ndarray) -> np.ndarray:
    """Strict local maxima with plateau midpoints (scipy _local_maxima_1d)."""
    peaks = []
    i = 1
    i_max = len(x) - 1
    while i < i_max:
        if x[i - 1] < x[i]:
            i_ahead = i + 1
            while i_ahead < i_max and x[i_ahead] == x[i]:
                i_ahead += 1
            if x[i_ahead] < x[i]:
                left_edge = i
                right_edge = i_ahead - 1
                peaks.append((left_edge + right_edge) // 2)
                i = i_ahead
            else:
                i = i_ahead
        else:
            i += 1
    return np.asarray(peaks, dtype=np.intp)


def _peak_prominences(x: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    prominences = np.empty(len(peaks), dtype=np.float64)
    for k, peak in enumerate(peaks):
        i = peak
        left_min = x[peak]
        while i > 0 and x[i - 1] <= x[peak]:
            i -= 1
            if x[i] < left_min:
                left_min = x[i]
        i = peak
        right_min = x[peak]
        n = len(x)
        while i < n - 1 and x[i + 1] <= x[peak]:
            i += 1
            if x[i] < right_min:
                right_min = x[i]
        prominences[k] = x[peak] - max(left_min, right_min)
    return prominences


def _select_by_distance(peaks: np.ndarray, priority: np.ndarray, distance: float) -> np.ndarray:
    n = len(peaks)
    keep = np.ones(n, dtype=bool)
    order = np.argsort(priority)  # ascending; iterate from highest
    dist = int(np.ceil(distance))
    for idx in order[::-1]:
        if not keep[idx]:
            continue
        k = idx - 1
        while k >= 0 and peaks[idx] - peaks[k] < dist:
            keep[k] = False
            k -= 1
        k = idx + 1
        while k < n and peaks[k] - peaks[idx] < dist:
            keep[k] = False
            k += 1
    return keep


def find_peaks(x: np.ndarray, distance=None, prominence=None) -> np.ndarray:
    """scipy.signal.find_peaks subset: distance + prominence filters in
    scipy's order; raises ValueError for distance < 1 like scipy."""
    x = np.asarray(x, dtype=np.float64)
    peaks = _local_maxima(x)
    if distance is not None:
        if distance < 1:
            raise ValueError("`distance` must be greater or equal to 1")
        keep = _select_by_distance(peaks, x[peaks], distance)
        peaks = peaks[keep]
    if prominence is not None:
        prominences = _peak_prominences(x, peaks)
        peaks = peaks[prominences >= prominence]
    return peaks


def get_road_centres(prediction: np.ndarray, distance=2000, prominence=100) -> np.ndarray:
    road_pixels_per_col = get_road_pixels_per_column(prediction)
    return find_peaks(road_pixels_per_col, distance=distance, prominence=prominence)


def find_road_centre(segmentation: np.ndarray) -> np.ndarray:
    distance = int(2000 * segmentation.shape[1] // 5760)
    prominence = int(100 * segmentation.shape[0] // 2880)
    return get_road_centres(segmentation, distance=distance, prominence=prominence)


def crop_panoramic_images(segmentation: np.ndarray) -> list[np.ndarray]:
    height, width = segmentation.shape
    w4 = int(width / 4)
    h4 = int(height / 4)
    h_for_43 = int(w4 * 3 / 4)
    crops = []
    for w in range(4):
        crops.append(segmentation[h4 : h4 + h_for_43, w * w4 : (w + 1) * w4])
    return crops


def crop_panoramic_images_roads(
    original_width: int, segmentation: np.ndarray, road_centre
) -> list[np.ndarray]:
    height, width = segmentation.shape
    duplicated = [c - original_width for c in road_centre if c >= original_width]
    road_centre = [c for c in road_centre if c not in duplicated]

    w4 = int(width / 4)
    h4 = int(height / 4)
    h_for_43 = int(w4 * 3 / 4)
    w98 = width + (w4 / 2)
    xrapneeded = int(width * 7 / 8)

    crops = []
    for centre in road_centre:
        if centre >= w98:
            xlo = int((width - centre) - w4 / 2)
            crops.append(segmentation[h4 : h4 + h_for_43, xlo : xlo + w4])
        elif centre > xrapneeded:
            xlo = int(centre - (w4 / 2))
            w4_p1 = width - xlo
            w4_p2 = w4 - w4_p1
            part1 = segmentation[h4 : h4 + h_for_43, xlo : xlo + w4_p1]
            part2 = segmentation[h4 : h4 + h_for_43, 0:w4_p2]
            crops.append(np.concatenate((part1, part2), axis=1))
        elif centre < (w4 / 2):
            w4_p1 = int((w4 / 2) - centre)
            xhi = width - w4_p1
            w4_p2 = w4 - w4_p1
            part1 = segmentation[h4 : h4 + h_for_43, xhi : xhi + w4_p1]
            part2 = segmentation[h4 : h4 + h_for_43, 0:w4_p2]
            crops.append(np.concatenate((part1, part2), axis=1))
        else:
            xlo = int(centre - w4 / 2)
            crops.append(segmentation[h4 : h4 + h_for_43, xlo : xlo + w4])
    return crops


def get_gvi(segmentations: list[np.ndarray]) -> float:
    total_pixels = 0
    vegetation_pixels = 0
    for segment in segmentations:
        total_pixels += segment.size
        vegetation_pixels += int((segment == VEGETATION).sum())
    return vegetation_pixels / total_pixels if total_pixels else 0


def process_labels(
    labels: np.ndarray, is_panoramic: bool, cut_by_road_centres: bool = False
) -> tuple:
    """-> (gvi, is_panoramic, missing, error) with the reference's exact
    flag semantics (process_data.py:281, 294, 297, 300)."""
    try:
        grid = to_grid(labels)
        if grid is None:
            raise ValueError("page too short to form a label grid")
        if is_panoramic:
            height = grid.shape[0]
            bottom_crop = int(height * 0.2)
            grid = grid[: height - bottom_crop, :]
            if cut_by_road_centres:
                width = grid.shape[1]
                w4 = int(0.25 * width)
                widened = np.concatenate((grid, grid[:, :w4]), axis=1)
                road_centre = find_road_centre(widened)
                crops = crop_panoramic_images_roads(width, widened, list(road_centre))
                return (get_gvi(crops), True, False, False)
            crops = crop_panoramic_images(grid)
            return (get_gvi(crops), True, False, False)
        road_centre = find_road_centre(grid)
        if len(road_centre) > 0:
            return (get_gvi([grid]), False, False, False)
        return (None, None, True, False)
    except Exception:
        return (None, None, True, True)
