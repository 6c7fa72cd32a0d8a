"""No engine output block may carry pandas schema metadata.

Round-3's only red CORRECTNESS row (`events_asof`) was purely
representational: ``pa.Table.from_pandas`` attaches a ``b'pandas'``
metadata blob, and a pandas ``Int64`` extension column recorded there is
reconstructed as ``Int64`` by ``to_pandas()`` instead of degrading its
nulls to float64 the way a plain Arrow int64 column (and a DuckDB result
frame) does — byte-identical values, different hash.  The engine-wide fix
routes every pandas→Arrow conversion through
``arrowutil.from_pandas_clean`` which strips the blob.

These tests enforce the invariant two ways: statically (no direct
``pa.Table.from_pandas`` call site exists anywhere in the package) and
dynamically (the round-3 offender's output blocks carry no metadata and
its nullable-int column degrades identically to its salted twin's).
"""

import pathlib

import pandas as pd
import pyarrow as pa

PKG = pathlib.Path(__file__).resolve().parent.parent / "clinicaltransformerner_ray"
ENTRY = pathlib.Path(__file__).resolve().parent.parent / "__ray_entry__.py"


def test_no_direct_from_pandas_call_sites():
    """Static guarantee: the only pa.Table.from_pandas call in the repo is
    the one inside arrowutil.from_pandas_clean (which strips metadata)."""
    offenders = []
    for p in [*PKG.rglob("*.py"), ENTRY]:
        if p.name == "arrowutil.py":
            continue
        if "pa.Table.from_pandas(" in p.read_text():
            offenders.append(str(p))
    assert offenders == [], f"direct from_pandas call sites: {offenders}"


def test_from_pandas_clean_strips_metadata_and_extension_dtypes():
    df = pd.DataFrame({
        "a": pd.array([1, None, 3], dtype="Int64"),
        "b": ["x", "y", "z"],
    })
    from clinicaltransformerner_ray.arrowutil import from_pandas_clean

    tbl = from_pandas_clean(df)
    assert tbl.schema.metadata is None
    assert tbl.schema.field("a").type == pa.int64()
    # the round-3 failure mode: metadata-free nullable int64 degrades to
    # float64 on to_pandas, matching a DuckDB result frame
    assert str(tbl.to_pandas()["a"].dtype) == "float64"
    # the un-stripped construction would have reconstructed Int64
    raw = pa.Table.from_pandas(df, preserve_index=False)
    assert str(raw.to_pandas()["a"].dtype) == "Int64"


def test_asof_blocks_carry_no_pandas_metadata(ray_session):
    """End-to-end on the round-3 offender: every output block of the
    unsalted as-of join is metadata-free and its nullable-int column
    matches the salted twin's representation exactly."""
    import ray

    import __ray_entry__ as e

    qs = e.queries()
    sf = "/root/testdata/sf0.001"
    ds = qs["events_asof_unsalted"](sf)
    tbls = ray.get(ds.to_arrow_refs())
    assert all(t.schema.metadata is None for t in tbls)
    df_plain = pa.concat_tables([t for t in tbls if t.num_rows]).to_pandas()
    df_salted = qs["events_asof"](sf).to_pandas()
    assert str(df_plain["asof_event_id"].dtype) == str(
        df_salted["asof_event_id"].dtype) == "float64"
