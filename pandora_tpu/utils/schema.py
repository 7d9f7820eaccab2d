"""Minimal json-checker-style schema validation.

The reference validates configs with the ``json_checker`` package
(check_configuration.py throughout); that package is not available here, so
this is a tiny equivalent supporting the combinators the configs need:
``And``, ``Or``, type checks, literal values, predicates, nested dicts and
typed lists.
"""

from __future__ import annotations

from typing import Any


class SchemaError(ValueError):
    pass


class And:
    def __init__(self, *clauses):
        self.clauses = clauses

    def check(self, value, path):
        for c in self.clauses:
            _check(c, value, path)


class Or:
    def __init__(self, *clauses):
        self.clauses = clauses

    def check(self, value, path):
        errors = []
        for c in self.clauses:
            try:
                _check(c, value, path)
                return
            except SchemaError as exc:
                errors.append(str(exc))
        raise SchemaError(f"{path}: no alternative matched value {value!r} ({errors})")


def _check(schema: Any, value: Any, path: str) -> None:
    if isinstance(schema, (And, Or)):
        schema.check(value, path)
    elif isinstance(schema, type):
        if schema is int and isinstance(value, bool):
            raise SchemaError(f"{path}: expected int, got bool")
        if schema is float and isinstance(value, int) and not isinstance(value, bool):
            return  # ints are acceptable floats
        if not isinstance(value, schema):
            raise SchemaError(f"{path}: expected {schema.__name__}, got {type(value).__name__}")
    elif isinstance(schema, dict):
        if not isinstance(value, dict):
            raise SchemaError(f"{path}: expected dict, got {type(value).__name__}")
        for k, sub in schema.items():
            if k not in value:
                raise SchemaError(f"{path}: missing key {k!r}")
            _check(sub, value[k], f"{path}.{k}")
    elif isinstance(schema, list):
        if not isinstance(value, (list, tuple)) or len(value) != len(schema):
            raise SchemaError(f"{path}: expected list of length {len(schema)}")
        for i, (sub, v) in enumerate(zip(schema, value)):
            _check(sub, v, f"{path}[{i}]")
    elif callable(schema):
        try:
            ok = schema(value)
        except Exception as exc:  # predicate crashed == failed
            raise SchemaError(f"{path}: predicate raised {exc!r} on {value!r}") from exc
        if not ok:
            raise SchemaError(f"{path}: predicate rejected value {value!r}")
    else:  # literal
        if value != schema:
            raise SchemaError(f"{path}: expected literal {schema!r}, got {value!r}")


def validate(schema: dict, cfg: dict, allow_extra: bool = False, path: str = "cfg") -> dict:
    """Validate ``cfg`` against ``schema`` (all schema keys required, extra
    keys rejected unless ``allow_extra``)."""
    if not isinstance(cfg, dict):
        raise SchemaError(f"{path}: expected dict")
    if not allow_extra:
        extra = set(cfg) - set(schema)
        if extra:
            raise SchemaError(f"{path}: unexpected keys {sorted(extra)}")
    for key, sub in schema.items():
        if key not in cfg:
            raise SchemaError(f"{path}: missing key {key!r}")
        _check(sub, cfg[key], f"{path}.{key}")
    return cfg
