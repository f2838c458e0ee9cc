"""CCDC (Continuous Change Detection and Classification) array kernels.

Pure-numpy port of the reference's CCDC segment processing
(/root/reference/geeflow/ccdc_utils.py), minus the EE band plumbing:

  - pad_segments: ragged per-pixel segment lists -> zero-padded
    (num_segments,) / (num_segments, 8) arrays (≙ arrayCat+arraySlice,
    ccdc_utils.py:26-56)
  - stack_bands: per-band (H, W, T) / (H, W, T, 8) -> (T, H, W, C)
    (≙ get_ccdc_pixels + generate_ccdc reshaping, ccdc_utils.py:59-82)
  - select_annual: per-year segment selection, `longest` (max in-year
    duration, ccdc_utils.py:91-100) or `middle` (last segment starting
    before mid-year, ccdc_utils.py:101-111), with the exact argmax /
    searchsorted-free formulations of the reference.

The Spark surface (`ccdc_examples`) applies these inside a pandas UDF
over rows of ragged segment arrays (FIXTURES.md §7 schema).
"""

from __future__ import annotations

import numpy as np

COEFS_DIM = 8


def pad_segments(arr, num_segments: int) -> np.ndarray:
    """Zero-pad/truncate the leading (segment) axis to num_segments.
    Accepts (t,) or (t, 8) input; returns float32."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 1:
        out = np.zeros(num_segments, dtype=np.float32)
        t = min(len(a), num_segments)
        out[:t] = a[:t]
        return out
    out = np.zeros((num_segments, a.shape[1]), dtype=np.float32)
    t = min(a.shape[0], num_segments)
    out[:t] = a[:t]
    return out


def stack_bands(bands: dict[str, np.ndarray], select: list[str]
                ) -> np.ndarray:
    """{band: (H, W, T) or (H, W, T, 8)} -> (T, H, W, C) in `select`
    order, 1-D bands contributing C=1 (≙ generate_ccdc
    ccdc_utils.py:80-82)."""
    parts = []
    for b in select:
        a = np.asarray(bands[b], dtype=np.float32)
        if a.ndim == 3:
            a = a[..., None]  # (H, W, T, 1)
        parts.append(a)
    ccdc = np.concatenate(parts, axis=-1)      # (H, W, T, C)
    return np.transpose(ccdc, (2, 0, 1, 3))    # (T, H, W, C)


def select_annual(ccdc: np.ndarray, select: list[str], year_from: int,
                  year_to: int, selection: str = "longest",
                  year_selection=None
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(T, H, W, C) -> per-year (Y, H, W, C) + validity mask.

    Verbatim math of ccdc_utils.py:86-122 (argmax tie rule included:
    np.argmax picks the FIRST max / first True).
    """
    num_segments, h, w, num_bands = ccdc.shape
    start_dates = ccdc[..., select.index("tStart")]  # (T, H, W)
    years = np.arange(year_from, year_to + 1)

    if selection == "longest":
        start_within = np.maximum(years[:, None, None, None],
                                  start_dates[None, ...])
        end_dates = ccdc[..., select.index("tEnd")]
        end_within = np.minimum((years + 1)[:, None, None, None],
                                end_dates[None, ...])
        durations = np.maximum(0, end_within - start_within)
        final_indices = np.argmax(durations, axis=1)  # (Y, H, W)
    else:  # "middle": last segment starting before the middle of the year
        target_dates = years[:, None, None, None] + 0.5
        is_after = start_dates[None, ...] > target_dates  # (Y, T, H, W)
        padding = np.ones((len(years), 1, h, w), dtype=bool)
        is_after = np.concatenate([is_after, padding], axis=1)
        first_after = np.argmax(is_after, axis=1)
        final_indices = np.maximum(0, first_after - 1)

    final_indices = final_indices.reshape(len(years), h * w, 1)
    flat = ccdc.reshape(num_segments, h * w, num_bands)
    out = np.take_along_axis(flat, final_indices, axis=0)
    out = out.reshape(-1, h, w, num_bands)
    mask = out[..., select.index("tStart")] > 0
    if year_selection is not None:
        out = out[year_selection]
        mask = mask[year_selection]
    return out, mask


def ccdc_examples(rows_tstart, rows_tend, rows_coefs, num_segments: int,
                  year_from: int | None = None, year_to: int | None = None,
                  selection: str = "longest"):
    """Batch kernel for the Spark operator: lists of ragged per-pixel
    (tStart, tEnd, coefs) -> list of (flattened tensor, shape, mask).

    Each row is ONE pixel (H=W=1), matching the reference's per-pixel
    fetch shape (ccdc_utils_test.py:39-50).
    """
    out = []
    for tstart, tend, coefs in zip(rows_tstart, rows_tend, rows_coefs):
        bands = {
            "tStart": pad_segments(tstart, num_segments)[None, None, :],
            "tEnd": pad_segments(tend, num_segments)[None, None, :],
            "coefs": pad_segments(
                np.asarray(coefs, dtype=np.float32).reshape(-1, COEFS_DIM)
                if len(coefs) else np.zeros((0, COEFS_DIM)),
                num_segments)[None, None, :, :],
        }
        ccdc = stack_bands(bands, ["tStart", "tEnd", "coefs"])
        if year_from is None:
            mask = ccdc[..., 0] > 0
            out.append((ccdc, mask))
        else:
            out.append(select_annual(ccdc, ["tStart", "tEnd", "coefs"],
                                     year_from, year_to, selection))
    return out
