"""Type-dispatch profiling builders.

Mirrors the reference's builder semantics
(``/root/reference/thoth/profiler.py:40-135``): a list of
(Spark type → analyzer classes) mappings walked over the input schema via
``issubclass`` matching, plus extra pre-instantiated analyzers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql.types import DataType, NumericType, StringType, StructField

from thoth_spark.profiler.analyzers import (
    Analyzer,
    ApproxQuantiles,
    Completeness,
    CountDistinct,
    ExactQuantiles,
    Mean,
    Size,
    StandardDeviation,
)

AnalyzerFactory = Callable[[str], Analyzer]


@dataclass
class Type2Analyzers:
    """Mapping from a Spark data type to analyzer factories (each takes a
    column name)."""

    data_type: type[DataType]
    analyzers: list[AnalyzerFactory]


class ProfilingBuilder:
    """Builds the analyzer set for a schema: all type-mapping matches plus
    any extra analyzer instances."""

    def __init__(
        self,
        type_mappings: list[Type2Analyzers] | None = None,
        analyzers: list[Analyzer] | None = None,
    ):
        if not (type_mappings or analyzers):
            raise ValueError("At least type_mappings or analyzers must be used.")
        self.type_mappings = type_mappings or []
        self.analyzers = analyzers or []

    def build_analyzers(self, structured_fields: list[StructField]) -> list[Analyzer]:
        built: list[Analyzer] = []
        for field in structured_fields:
            col_name, col_type = field.name, type(field.dataType)
            for mapping in self.type_mappings:
                if issubclass(col_type, mapping.data_type):
                    built += [factory(col_name) for factory in mapping.analyzers]
        return built + self.analyzers


class DefaultProfilingBuilder(ProfilingBuilder):
    """Numeric → Mean/StdDev(pop)/ApproxQuantiles(.25/.5/.75); every column
    → Completeness; string → exact CountDistinct; dataset → Size.
    Parity with the reference default (``thoth/profiler.py:86-112``)."""

    def __init__(self) -> None:
        super().__init__(
            type_mappings=[
                Type2Analyzers(
                    data_type=NumericType,
                    analyzers=[Mean, StandardDeviation, ApproxQuantiles],
                ),
                Type2Analyzers(data_type=DataType, analyzers=[Completeness]),
                Type2Analyzers(data_type=StringType, analyzers=[CountDistinct]),
            ],
            analyzers=[Size()],
        )


class ExactProfilingBuilder(ProfilingBuilder):
    """Like the default but with exact interpolated quantiles — fully
    deterministic, hence oracle-checkable against an ANSI-SQL engine."""

    def __init__(self) -> None:
        super().__init__(
            type_mappings=[
                Type2Analyzers(
                    data_type=NumericType,
                    analyzers=[Mean, StandardDeviation, ExactQuantiles],
                ),
                Type2Analyzers(data_type=DataType, analyzers=[Completeness]),
                Type2Analyzers(data_type=StringType, analyzers=[CountDistinct]),
            ],
            analyzers=[Size()],
        )


class SimpleProfilingBuilder(ProfilingBuilder):
    """Numeric → Mean; every column → Completeness; dataset → Size."""

    def __init__(self) -> None:
        super().__init__(
            type_mappings=[
                Type2Analyzers(data_type=NumericType, analyzers=[Mean]),
                Type2Analyzers(data_type=DataType, analyzers=[Completeness]),
            ],
            analyzers=[Size()],
        )
