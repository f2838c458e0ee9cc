"""Example assembly: band stacking, padding, center-crop, dtype coercion.

Port of the reference's example post-processing
(/root/reference/geeflow/ee_export_utils.py:255-407) as numpy kernels +
Spark column helpers. These are the fiddly rules SURVEY §7.4 flags:

  - stack_channels / stack_timesteps: group band keys "src/band" and
    "src#t/band", dstack channels, stack timesteps sorted numerically
    (:262-284) - order preserved through any shuffle because the sort is
    on the embedded #t index, not arrival order;
  - pad_missing_source: time-varying sources absent for an item get
    empty value/mask/timestamps arrays (:297-305);
  - center_crop: EE returns s or s+1 rows/cols; crop to s x s around the
    center with the exact index math (:358-371), asserting the s/s+1
    contract (:365-366);
  - example filters: filter_empty_forest_loss = max(hansen[..., 1]) > 0
    (:310-318), filter_empty_sequences (:319-324);
  - coerce_dtype: "_mask"/"hr" -> uint8, "*_timestamps" -> int64,
    per-source dtype override, everything else int/float64 -> float32
    unless in ignore_for_float_conversion; scalars unchanged (:375-404);
  - tfds key: "-".join(id column values) (:405-407).
"""

from __future__ import annotations

import numpy as np


def stack_channels(pixels: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """{"src/band": (H,W)} -> {"src": (H,W,C)} via dstack, bands in
    insertion order (:262-267)."""
    import collections
    tmp = collections.defaultdict(list)
    for k in list(pixels):
        name, *_ = k.split("/")
        tmp[name].append(pixels[k])
    return {k: np.dstack(v) for k, v in tmp.items()}


def stack_timesteps(pixels: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """{"src#t": (H,W,C)} -> {"src": (T,H,W,C)} with t sorted numerically
    (:269-284); non-temporal keys pass through."""
    import collections
    out = {}
    temporal = collections.defaultdict(dict)
    for source in sorted(pixels):
        if "#" not in source:
            out[source] = pixels[source]
        else:
            name, idx = source.split("#")
            temporal[name][int(idx)] = pixels[source]
    for name, data in temporal.items():
        out[name] = np.array([data[k] for k in sorted(data)])
    return {k: np.asarray(v) for k, v in out.items()}


def pad_missing_source(pixels: dict, source_keys: list[str],
                       time_varying: set[str]) -> dict:
    """Missing time-varying sources -> empty arrays (:297-305)."""
    for key in source_keys:
        if key not in pixels and key in time_varying:
            for postfix in ["", "_mask", "_timestamps"]:
                pixels[key + postfix] = np.array([])
    return pixels


def center_crop(data: np.ndarray, s: int) -> np.ndarray:
    """Crop trailing (H, W) dims to s x s around the center; input dims
    must be s or s+1 (:358-371)."""
    data = np.asarray(data)
    if data.ndim not in (3, 4):
        return data
    if data.shape[-3] == s and data.shape[-2] == s:
        return data
    assert data.shape[-3] in (s, s + 1)
    assert data.shape[-2] in (s, s + 1)
    return data[
        ...,
        data.shape[-3] // 2 - s // 2: data.shape[-3] // 2 + s - s // 2,
        data.shape[-2] // 2 - s // 2: data.shape[-2] // 2 + s - s // 2,
        :]


def grid_cells_for_width(image_width: float, scale, use_utm: bool = True
                         ) -> int:
    """Grid size s from image width and scale (:344-353), incl. the
    float-scale ceil + exactness assert and the UTM divisibility rule."""
    import math
    assert image_width >= scale, f"{image_width} < {scale}"
    if isinstance(scale, float):
        s = math.ceil(image_width / scale)
        assert abs(s * scale - image_width) < 1e-6
        return s
    if use_utm:
        assert image_width % scale == 0, f"{image_width} % {scale} != 0"
        return image_width // scale
    return math.ceil(image_width / scale)


def has_forest_loss(hansen: np.ndarray) -> bool:
    """max of channel 1 > 0 (:310-311)."""
    return bool(np.max(np.asarray(hansen)[..., 1]) > 0)


def filter_example(feature: dict, filter_empty_forest_loss: bool = False,
                   filter_empty_sequences=()) -> bool:
    """(:314-324); True = keep."""
    if filter_empty_forest_loss and not has_forest_loss(feature["hansen"]):
        return False
    keys = ([filter_empty_sequences]
            if isinstance(filter_empty_sequences, str)
            else filter_empty_sequences)
    for key in keys:
        if not len(np.atleast_1d(feature[key])):
            return False
    return True


def coerce_dtype(k: str, v, source_dtype=None,
                 ignore_for_float_conversion=()):
    """The float32 coercion rules (:380-404). Returns the coerced value
    (np.ndarray) or the original scalar."""
    dtype = None
    if k.endswith("_mask") or k == "hr":
        dtype = np.uint8
    elif k.endswith("_timestamps"):
        dtype = np.int64
    elif source_dtype is not None:
        dtype = source_dtype
    t = np.array(v, dtype=dtype)
    if (dtype is None and
            (not t.size or isinstance(t.flat[0], np.integer)
             or isinstance(t.flat[0], np.float64)) and
            k not in ignore_for_float_conversion):
        t = t.astype(np.float32)
    if t.shape:
        return t
    return v  # scalars kept as-is (:400-404)


def tfds_key(item: dict, id_keys=("id",)) -> str:
    """"-".join of id values (:405-407)."""
    return "-".join(map(str, (item[k] for k in id_keys)))
