"""Renderer parity (printTopType/printType/printFlat) and lattice properties."""

import json

from hypothesis import given, settings, strategies as st

from hive_json_spark.types import (
    NullT,
    canonicalize,
    infer_type,
    iter_json_documents,
    loads_first,
    merge_types,
    to_flat,
    to_hive_ddl,
    to_spark_type,
)


def infer_corpus(*docs):
    t = None
    for d in docs:
        t = merge_types(t, infer_type(loads_first(d)))
    return t


# --- DDL rendering (JsonSchemaFinder.java:153-221 shapes) --------------------

def test_ddl_flat_schema():
    t = infer_corpus('{"a": 1, "b": "x"}')
    assert to_hive_ddl(t) == "create table tbl (\n  a tinyint,\n  b string\n)\n"


def test_ddl_nested_struct():
    t = infer_corpus('{"a": {"b": 12, "c": true}, "d": "2016-01-05T12:34:56Z"}')
    assert to_hive_ddl(t) == (
        "create table tbl (\n"
        "  a struct <\n"
        "    b: tinyint,\n"
        "    c: boolean>,\n"
        "  d timestamp\n"
        ")\n"
    )


def test_ddl_array_and_union():
    t = infer_corpus('{"xs": [1, 2]}', '{"xs": "oops"}')
    assert to_hive_ddl(t) == (
        "create table tbl (\n  xs uniontype <array <tinyint>,string>\n)\n"
    )


# --- flat rendering (printFlat parity: HiveType.java:88-90 + overrides) ------

def test_flat_rendering():
    t = infer_corpus('{"a": {"b": 5}, "xs": [1], "u": true}', '{"u": 7}')
    assert to_flat(t, "root") == (
        "root.a.b: tinyint\n"
        "root.u.0: boolean\n"
        "root.u.1: tinyint\n"
        "root.xs._list: tinyint\n"
    )


def test_flat_top_level_scalar():
    # flat mode tolerates non-struct roots (JsonSchemaFinder.java:251)
    assert to_flat(infer_corpus("5"), "root") == "root: tinyint\n"


# --- concatenated-document parsing (JsonStreamParser parity) -----------------

def test_iter_json_documents_concatenated():
    docs = list(iter_json_documents('{"a":1}{"a":2}\n  {"a":3}'))
    assert [json.loads(json.dumps({"a": int(d["a"])})) for d in docs] == [
        {"a": 1},
        {"a": 2},
        {"a": 3},
    ]


def test_iter_json_documents_scalars_and_empty():
    assert list(iter_json_documents("")) == []
    vals = list(iter_json_documents('5 "x" [1]'))
    assert len(vals) == 3


# --- Spark type mapping ------------------------------------------------------

def test_to_spark_type_shapes():
    from pyspark.sql import types as T

    t = infer_corpus('{"i": 1, "d": 1234.5, "s": "x", "xs": [100000]}')
    st_ = to_spark_type(t)
    assert isinstance(st_, T.StructType)
    by_name = {f.name: f.dataType for f in st_.fields}
    assert by_name["i"] == T.ByteType()
    assert by_name["d"] == T.DecimalType(5, 1)
    assert by_name["s"] == T.StringType()
    assert by_name["xs"] == T.ArrayType(T.IntegerType(), True)


def test_to_spark_type_union_tagged_and_string():
    from pyspark.sql import types as T

    t = infer_corpus('{"u": 1}', '{"u": "x"}')
    tagged = to_spark_type(t)
    u = dict((f.name, f.dataType) for f in tagged.fields)["u"]
    assert [f.name for f in u.fields] == ["tag", "field0", "field1"]
    decayed = to_spark_type(t, union_mode="string")
    assert dict((f.name, f.dataType) for f in decayed.fields)["u"] == T.StringType()


# --- lattice properties (hypothesis) -----------------------------------------

json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(10**20), max_value=10**20)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=8),
    lambda children: st.lists(children, max_size=3)
    | st.dictionaries(st.text(max_size=4), children, max_size=3),
    max_leaves=8,
)


def via_json(v):
    return loads_first(json.dumps(v))


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_merge_idempotent(v):
    t = infer_type(via_json(v))
    assert merge_types(t, t) == t


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_null_is_identity(v):
    t = infer_type(via_json(v))
    assert merge_types(t, NullT()) == t
    assert merge_types(NullT(), t) == t


@settings(max_examples=200, deadline=None)
@given(json_values, json_values)
def test_merge_commutative_up_to_canonical_order(a, b):
    ta, tb = infer_type(via_json(a)), infer_type(via_json(b))
    assert canonicalize(merge_types(ta, tb)) == canonicalize(merge_types(tb, ta))


@settings(max_examples=100, deadline=None)
@given(json_values, json_values, json_values)
def test_merge_associative_up_to_canonical_order(a, b, c):
    ta, tb, tc = (infer_type(via_json(x)) for x in (a, b, c))
    left = merge_types(merge_types(ta, tb), tc)
    right = merge_types(ta, merge_types(tb, tc))
    assert canonicalize(left) == canonicalize(right)


def test_schema_diff_evolution():
    from hive_json_spark.types import infer_type, merge_types, schema_diff

    old = infer_type({"a": 1, "b": "x", "gone": True})
    new = infer_type({"a": 100000, "b": "y", "fresh": [1]})
    d = dict((p, (c, det)) for p, c, det in schema_diff(old, new))
    assert d["root.a"][0] == "widened"          # tinyint -> int
    assert d["root.fresh"][0] == "added"
    assert d["root.gone"][0] == "removed"
    assert "root.b" not in d                     # unchanged
    # incompatible change flags as "changed"
    old2 = infer_type({"x": 1})
    new2 = infer_type({"x": "s"})
    assert schema_diff(old2, new2)[0][1] == "changed"
    # merging old into new is always "widened"-only from old's perspective
    widened = merge_types(old, new)
    assert all(c in ("widened", "added") for _, c, _ in schema_diff(old, widened))


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_canonicalize_idempotent(v):
    t = canonicalize(infer_type(via_json(v)))
    assert canonicalize(t) == t


@settings(max_examples=200, deadline=None)
@given(json_values, json_values)
def test_to_spark_type_total(a, b):
    """Every type the lattice can produce (incl. merge-created unions) maps
    to a Spark type in both union modes without error."""
    t = merge_types(infer_type(via_json(a)), infer_type(via_json(b)))
    to_spark_type(t)
    to_spark_type(t, union_mode="string")


@settings(max_examples=100, deadline=None)
@given(
    st.lists(json_values, min_size=2, max_size=6),
    st.integers(min_value=0, max_value=2**31),
)
def test_canonical_fold_is_permutation_invariant(vs, seed):
    """The distributed-determinism claim behind ``canonicalize``
    (types.py): folding the SAME type multiset in ANY order — and any
    reduction shape — canonicalizes to one identical tree. This is the
    property the partial+final tree-reduce in infer.py depends on: Spark
    gives no ordering guarantee across partitions, and the reference's
    union branch order is fold-order-sensitive (UnionType.java:89-100),
    so only canonicalize(fold(perm)) being constant makes the distributed
    result well-defined. Sequential folds over 10 random permutations
    plus 5 random binary reduction trees must all agree."""
    import functools
    import random as _random

    from hive_json_spark.types import merge_types as _merge

    ts = [infer_type(via_json(v)) for v in vs]
    rnd = _random.Random(seed)

    base = canonicalize(functools.reduce(_merge, ts))
    for _ in range(10):
        order = list(range(len(ts)))
        rnd.shuffle(order)
        assert canonicalize(functools.reduce(_merge, [ts[i] for i in order])) == base
    for _ in range(5):
        pool = list(ts)
        while len(pool) > 1:  # random pairwise reduction tree
            a = pool.pop(rnd.randrange(len(pool)))
            b = pool.pop(rnd.randrange(len(pool)))
            pool.append(_merge(a, b))
        assert canonicalize(pool[0]) == base
