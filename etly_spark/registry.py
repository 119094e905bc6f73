"""Named-callable registries — the engine's UDF surface.

The reference's core extension model is five global registries of Go
callbacks referenced *by string name* in JSON config (transformer.go:10-31,
filter.go:11-30, content_enricher.go:11-30, message_provider.go:11-30,
variable_provider.go:13-42). We keep the same name-in-config contract but
register *DataFrame/Column builders* so logic stays JVM-side and Catalyst
sees through it; a plain Python/pandas UDF is the registered callable's
own (discouraged) choice, not the registry's.

Registered shapes:
- transformer:        (DataFrame) -> DataFrame            # 1→1 projection/map
- filter:             (DataFrame) -> Column               # boolean predicate
- enricher:           (DataFrame, ctx: dict) -> DataFrame # add columns w/ context
- schema:             StructType | () -> StructType       # replaces MessageProvider
- variable_provider:  () -> Column                        # record-level $var value
- raw_decoder:        (raw: Column, schema) -> Column     # struct; RawUnmarshaler
- raw_encoder:        (DataFrame, data_cols) -> Column    # line str; RawMarshaler

Raw codecs (reference encoding.go:17-23, dispatch util.go:141-168): a
DataType registered in ``raw_decoders`` bypasses ``from_json`` on the
source side (null struct ⇒ corrupt line); a Target.DataType registered
in ``raw_encoders`` bypasses ``to_json`` on the sink side. Both stay
Column expressions — the custom codec fuses into codegen like the JSON
path it replaces.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Generic, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._items: dict[str, T] = {}

    def register(self, name: str, item: T | None = None):
        """Register an item, or use as a decorator when item is omitted."""
        if item is None:

            def deco(fn: T) -> T:
                self._items[name] = fn
                return fn

            return deco
        if name in self._items:
            raise ValueError(f"{self.kind} {name!r} already registered")
        self._items[name] = item
        return item

    def get(self, name: str) -> T:
        if name not in self._items:
            raise KeyError(
                f"failed to lookup {self.kind} {name!r}; registered: {sorted(self._items)}"
            )
        return self._items[name]

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def names(self) -> list[str]:
        return sorted(self._items)


transformers: Registry = Registry("transformer")
filters: Registry = Registry("filter")
enrichers: Registry = Registry("content_enricher")
schemas: Registry = Registry("schema")  # replaces MessageProvider: name -> StructType
variable_providers: Registry = Registry("variable_provider")
raw_decoders: Registry = Registry("raw_decoder")  # encoding.go:17-19
raw_encoders: Registry = Registry("raw_encoder")  # encoding.go:21-23


def get_schema(name: str):
    """Resolve a registered schema; accepts StructType or factory."""
    item = schemas.get(name)
    return item() if callable(item) else item
