"""Derivation (qualified property) compiler.

A PURE ``qualifiedProperty`` is a computed column; the reference compiles
each through a mini plan ``Entity.all()->project([x|$x.qp],['qp'])``
(``Legend.scala:355-369``).  We compile the stored AST body directly.

Golden outputs (``python/tests/tests.py:106-115``)::

    hiringAge -> year(joined_date) - year(birth_date)
    age       -> year(current_date) - year(birth_date)
    initials  -> concat(substring(first_name, 0, 1), substring(last_name, 0, 1))
"""

from __future__ import annotations

from .model.loader import LegendModel
from .plans.compiler import EXPECTATION_STYLE, Context, to_pure, to_sql

Derivations = dict[str, str]


def class_derivations(model: LegendModel, cls, compile_sql: bool = True,
                      renames: dict[str, str] | None = None) -> Derivations:
    ctx = Context(model=model, cls=cls, renames=renames or {},
                  style=EXPECTATION_STYLE, guard_nullable=False)
    out: Derivations = {}
    for qp in model.all_qualified_properties(cls):
        if not qp.body:
            continue
        out[qp.name] = (to_sql(qp.body[0], ctx) if compile_sql
                        else to_pure(qp.body[0]))
    return out


def entity_derivations(model: LegendModel, entity_path: str,
                       compile_sql: bool = False) -> Derivations:
    return class_derivations(model, model.get_class(entity_path), compile_sql)


def mapping_derivations(model: LegendModel, mapping_path: str,
                        compile_sql: bool = True) -> Derivations:
    mapping = model.get_mapping(mapping_path)
    cls = model.get_class(mapping.class_path)
    return class_derivations(model, cls, compile_sql, mapping.property_columns)
