"""Cell-clustered layout: partition pruning reaches the scan, files are
fine-cell-sorted, and the coarse cell matches the numpy parent."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from geeflow_spark.functions import s2
from geeflow_spark.plans import layout
from geeflow_spark.sources import derived


@pytest.mark.parametrize("index", ["s2", "hex"])
def test_write_read_clustered(spark, tmp_path, index):
    p = str(tmp_path / f"docs_{index}")
    docs = derived.with_geo(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    layout.write_cell_clustered(docs, p, level=8, coarse_level=3,
                                index=index)
    back = spark.read.parquet(p)
    assert back.count() == docs.count()

    # coarse cell really is the parent of the fine cell
    pdf = back.select("cell", "cell_p").toPandas()
    if index == "s2":
        exp = s2.parent(pdf["cell"].to_numpy(np.int64).astype(np.uint64),
                        3).astype(np.int64)
    else:
        from geeflow_spark.functions import hex as hx
        exp = hx.parent(pdf["cell"].to_numpy(np.int64), 3)
    np.testing.assert_array_equal(pdf["cell_p"].to_numpy(np.int64), exp)

    # directory pruning: a cell_p predicate appears as PartitionFilters
    some = [int(pdf["cell_p"].iloc[0])]
    plan = layout.read_cells(spark, p, some)._jdf.queryExecution() \
        .executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]", plan)  # NON-empty
    assert layout.read_cells(spark, p, some).count() == \
        (pdf["cell_p"] == some[0]).sum()


def test_files_are_fine_cell_sorted(spark, tmp_path):
    p = str(tmp_path / "sorted")
    docs = derived.with_geo(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    layout.write_cell_clustered(docs, p, level=10, coarse_level=2)
    import glob
    import pandas as pd
    for f in glob.glob(f"{p}/cell_p=*/*.parquet"):
        cells = pd.read_parquet(f)["cell"].to_numpy()
        assert (np.diff(cells) >= 0).all(), f


def test_pruned_join_matches_full_join(spark, tmp_path):
    from geeflow_spark.operators import spatial_join
    from geeflow_spark.sources import synth
    p = str(tmp_path / "clustered")
    docs = derived.with_geo(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    layout.write_cell_clustered(docs, p, level=8, coarse_level=4)
    regions = synth.regions_pdf(6, radius_scale=2.0)

    full = spatial_join.join_points_regions(
        docs.select("doc_id", "lat", "lon"), regions, level=8) \
        .select("doc_id", "region_id").toPandas()
    pruned_df = layout.join_points_regions_pruned(
        spark, p, regions, level=8, coarse_level=4)
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]", plan)  # NON-empty
    pruned = pruned_df.select("doc_id", "region_id").toPandas()
    key = ["doc_id", "region_id"]
    import pandas as pd
    pd.testing.assert_frame_equal(
        full.sort_values(key).reset_index(drop=True),
        pruned.sort_values(key).reset_index(drop=True))
