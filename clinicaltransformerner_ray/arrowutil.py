"""Arrow interop helpers shared by every pipeline.

The one rule enforced here: **no engine output block may carry pandas
schema metadata**.  ``pa.Table.from_pandas`` attaches a ``b'pandas'``
metadata blob recording the source frame's dtypes; when a column was a
pandas ``Int64`` extension array, a later ``Table.to_pandas()`` honours
that blob and reconstructs ``Int64`` instead of letting nulls degrade to
float64 the way a plain Arrow int64 column (and a DuckDB result frame)
does.  Two kernels computing byte-identical values then hash differently
purely because one was built via ``from_pandas`` and the other via
``pa.table`` — the round-3 `events_asof` red row was exactly this.

Routing every pandas→Arrow conversion through :func:`from_pandas_clean`
makes block representation a function of the VALUES alone, independent of
which construction path a kernel happened to use.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def from_pandas_clean(df: "pd.DataFrame", **kwargs) -> pa.Table:
    """``pa.Table.from_pandas`` with pandas schema metadata stripped.

    Defaults ``preserve_index=False`` (the engine never emits frame
    indexes as columns).  The returned table's ``schema.metadata`` is
    ``None`` so ``to_pandas()`` round-trips use plain Arrow dtype rules
    — nullable int64 degrades to float64 exactly like a DuckDB result.
    """
    kwargs.setdefault("preserve_index", False)
    return pa.Table.from_pandas(df, **kwargs).replace_schema_metadata(None)
