"""LogPath pipeline builder.

Reference: lib/cfg-tree.c — a syslog-ng config wires sources through
log { source(); filter(); parser(); rewrite(); destination(); } paths.
`LogPath` gives the same declarative composition over DataFrames; the
whole path stays one lazy Catalyst plan, so filters written *after*
parsers still get pushed *below* them by the optimizer when legal —
something the reference's fixed pipeline order can't do.

`flags(final)` / fallback paths map to anti-join semantics
(`remainder()`), `junction/channel` to DataFrame union.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame


class LogPath:
    def __init__(self, df: DataFrame):
        self.df = df

    def filter(self, cond: Column) -> "LogPath":
        return LogPath(self.df.filter(cond))

    def parser(self, fn: Callable[[DataFrame], DataFrame], *args, **kwargs) -> "LogPath":
        return LogPath(fn(self.df, *args, **kwargs))

    def rewrite(self, fn: Callable[[DataFrame], DataFrame], *args, **kwargs) -> "LogPath":
        return LogPath(fn(self.df, *args, **kwargs))

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "LogPath":
        return LogPath(fn(self.df))

    def to(self, sink: Callable[[DataFrame], None]) -> DataFrame:
        sink(self.df)
        return self.df

    def frame(self) -> DataFrame:
        return self.df


def junction(*paths: LogPath) -> LogPath:
    """junction { channel {...}; channel {...}; } — union by column name."""
    df = paths[0].df
    for p in paths[1:]:
        df = df.unionByName(p.df, allowMissingColumns=True)
    return LogPath(df)


def split_path(df: DataFrame, cond: Column) -> tuple[LogPath, LogPath]:
    """A filtered path plus its fallback (flags(fallback)) — matched and
    unmatched halves of the stream."""
    return LogPath(df.filter(cond)), LogPath(df.filter(~cond))
