"""Include/exclude projection → ``select``/``drop``.

The reference translates string include/exclude sets into SQLAlchemy
defer/load_only options with ``*``/``**`` wildcards and memoization
(qcfractal/qcfractal/db_socket/helpers.py:135-231).  In Spark the translation
is a plain ``select``/``drop`` — Catalyst column pruning then guarantees the
parquet scan reads only the surviving columns (check ``ReadSchema`` in
``.explain``), which is what the reference's hand-rolled deferral buys it.
"""

from __future__ import annotations

import logging
from typing import Iterable

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)


def apply_projection(
    df: DataFrame,
    include: Iterable[str] | None = None,
    exclude: Iterable[str] | None = None,
    default_cols: Iterable[str] | None = None,
) -> DataFrame:
    """Resolve include/exclude sets against df columns.

    Semantics follow helpers.py:135-231: ``*`` in include means "all default
    columns"; otherwise include is the exact set; exclude is removed last.
    """
    cols = list(df.columns)
    default = list(default_cols) if default_cols is not None else cols
    if include is None:
        chosen = list(default)
    else:
        inc = set(include)
        if "**" in inc:
            chosen = list(cols)  # '**' = everything (helpers.py wildcard)
        elif "*" in inc:
            # '*' = the default column set, PLUS any extra names listed
            # alongside it.  DELIBERATE superset of the reference:
            # helpers.py:139 collapses include to defaults-only when '*'
            # appears with no exclude, silently ignoring extras — here
            # include=['*', 'payload_col'] means "defaults and also that
            # payload column", so an explicit user request is never
            # silently dropped.  Pure-'*' calls behave identically.
            extras = [c for c in cols if c in inc]
            if extras:
                # Make the divergence observable for reference-parity
                # consumers: the reference would have ignored these names.
                logger.warning(
                    "include=['*', ...] adds %s beyond the default column set "
                    "(the reference's '*' handling silently ignores extras)",
                    extras,
                )
            chosen = list(dict.fromkeys([*default, *extras]))
        else:
            chosen = [c for c in cols if c in inc]
    if exclude:
        exc = set(exclude)
        chosen = [c for c in chosen if c not in exc]
    if not chosen:
        raise ValueError("projection removed every column")
    return df.select(*chosen)
