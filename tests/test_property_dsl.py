"""Property-based differential tests.

Two independent implementations are compared on random inputs:
- the resource-filter DSL: Spark compilation vs a direct Python evaluator
  of the documented semantics
- the metric-expression translator: compiled Spark SQL vs the pure-Python
  interpreter mirroring the reference's per-index eval (errors -> skip)

The reference repo has no property-based testing (SURVEY §5); this is the
upgrade.
"""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from panoptes_spark.dsl.resource_filter import ResourceFilter

# ---------------------------------------------------------------------------
# resource filter DSL
# ---------------------------------------------------------------------------

SITES = ["dc1", "dc2", "dc3"]
CLASSES = ["network", "system"]
TYPES = ["arista", "cisco", "juniper"]
META_KEYS = ["make", "os_version"]
META_VALS = ["Arista", "Cisco", "4.20", "15.1", ""]

field_cond = st.one_of(
    st.tuples(st.just("resource_site"), st.sampled_from(["=", "!="]),
              st.sampled_from(SITES)),
    st.tuples(st.just("resource_class"), st.sampled_from(["=", "!="]),
              st.sampled_from(CLASSES)),
    st.tuples(st.just("resource_type"), st.sampled_from(["LIKE", "NOT LIKE"]),
              st.sampled_from(["ari%", "%o", "juniper", "x%", "cis_o",
                               "_isco", "%ri%"])),
    st.tuples(st.just("resource_site"), st.sampled_from(["IN", "NOT IN"]),
              st.lists(st.sampled_from(SITES), min_size=1, max_size=3)),
    st.tuples(
        st.sampled_from([f"resource_metadata.{k}" for k in META_KEYS]),
        st.sampled_from(["=", "!=", "LIKE", "NOT LIKE"]),
        st.sampled_from(["Arista", "4%", "%1", "Cisco"]),
    ),
)

query_strategy = st.lists(field_cond, min_size=1, max_size=4).flatmap(
    lambda conds: st.lists(
        st.sampled_from(["AND", "OR"]),
        min_size=len(conds) - 1,
        max_size=len(conds) - 1,
    ).map(lambda conns: (conds, conns))
)


def render_query(conds, conns):
    parts = []
    for i, (field, op, val) in enumerate(conds):
        if i:
            parts.append(conns[i - 1])
        if isinstance(val, list):
            rv = "(" + ", ".join(f'"{v}"' for v in val) + ")"
        else:
            rv = f'"{val}"'
        parts.append(f"{field} {op} {rv}")
    return " ".join(parts)


def py_like(value, pattern):
    import re

    rx = "^" + re.escape(pattern).replace("%", ".*").replace("_", ".") + "$"
    return re.match(rx, value) is not None


def py_eval_cond(res, field, op, val):
    if field.startswith("resource_metadata."):
        key = field.split(".", 1)[1]
        left = res["metadata"].get(key)  # missing key -> predicate false
        if left is None:
            return False
    else:
        left = res[field]
    if op == "=":
        return left == val
    if op == "!=":
        return left != val
    if op == "LIKE":
        return py_like(left, val)
    if op == "NOT LIKE":
        return not py_like(left, val)
    if op == "IN":
        return left in val
    if op == "NOT IN":
        return left not in val
    raise AssertionError(op)


def py_eval_query(res, conds, conns):
    # SQL precedence: AND over OR
    vals = [py_eval_cond(res, *c) for c in conds]
    groups = [[vals[0]]]
    for conn, v in zip(conns, vals[1:]):
        if conn == "AND":
            groups[-1].append(v)
        else:
            groups.append([v])
    return any(all(g) for g in groups)


RESOURCES = [
    {
        "resource_site": s,
        "resource_class": c,
        "resource_type": t,
        "resource_id": f"{s}-{c}-{t}-{i}",
        "metadata": meta,
    }
    for i, (s, c, t, meta) in enumerate(
        (s, c, t, m)
        for s in SITES
        for c in CLASSES
        for t in TYPES
        for m in [{"make": "Arista", "os_version": "4.20"},
                  {"make": "Cisco"}, {"os_version": "15.1"}, {}]
    )
]


@pytest.fixture(scope="module")
def resources_df(spark):
    rows = [
        (r["resource_site"], r["resource_class"], "sub", r["resource_type"],
         r["resource_id"], "ep", 1.0, "p", r["metadata"])
        for r in RESOURCES
    ]
    df = spark.createDataFrame(
        rows,
        "resource_site string, resource_class string, resource_subclass string,"
        " resource_type string, resource_id string, resource_endpoint string,"
        " resource_creation_timestamp double, resource_plugin string,"
        " resource_metadata map<string,string>",
    )
    df.cache().count()
    return df


@settings(max_examples=30, deadline=None)
@given(query_strategy)
def test_resource_filter_differential(spark, resources_df, q):
    conds, conns = q
    query = render_query(conds, conns)
    rf = ResourceFilter(query)
    spark_ids = {
        r.resource_id
        for r in resources_df.where(F.expr(rf.to_spark_sql()))
        .select("resource_id")
        .collect()
    }
    py_ids = {
        r["resource_id"] for r in RESOURCES if py_eval_query(r, conds, conns)
    }
    assert spark_ids == py_ids, f"query: {query}"


# ---------------------------------------------------------------------------
# metric-expression translator vs safe interpreter (differential)
# ---------------------------------------------------------------------------

from panoptes_spark.dsl.metric_compiler import MetricDSLCompiler, flatten_groups
from panoptes_spark.dsl.safe_eval import safe_eval

_leaf = st.one_of(
    st.integers(min_value=0, max_value=5).map(str),
    st.just("int(t1.$index)"),
    st.just("int(t2.$index)"),
)


def _expr_trees(depth):
    if depth == 0:
        return _leaf
    sub = _expr_trees(depth - 1)
    return st.one_of(
        _leaf,
        st.tuples(sub, st.sampled_from(["+", "-", "*", "/"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, sub, st.sampled_from(["<", ">=", "=="]), sub, sub).map(
            lambda t: f"({t[0]} if {t[2]} {t[3]} {t[4]} else {t[1]})"
            .replace("{t[2]}", "")  # placeholder; fixed below
        ),
    )


# simpler ternary construction (the .map above can't reference twice)
_ternary = st.tuples(_leaf, _leaf, st.sampled_from(["<", ">="]), _leaf, _leaf).map(
    lambda t: f"(({t[0]}) if ({t[2]}) {t[3]} ({t[4]}) else ({t[1]}))"
    if False else f"({t[0]} if {t[3]} {t[2]} {t[4]} else {t[1]})"
)

expr_strategy = st.one_of(
    _leaf,
    st.tuples(_leaf, st.sampled_from(["+", "-", "*", "/"]), _leaf).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    ),
    st.tuples(
        st.tuples(_leaf, st.sampled_from(["+", "-", "*", "/"]), _leaf).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.sampled_from(["+", "*", "/"]),
        _leaf,
    ).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
    _ternary,
)

# t1: indices 1..4 always; t2: subset with a gap and a non-numeric cell
T1 = {"1": "10", "2": "0", "3": "7", "4": "3"}
T2 = {"1": "2", "2": "5", "4": "x"}


@settings(max_examples=12, deadline=None)
@given(expr_strategy)
def test_metric_expr_differential(spark, expr):
    program = {
        "oids": {"t1": {"method": "bulk_walk", "oid": ".1"},
                 "t2": {"method": "bulk_walk", "oid": ".2"}},
        "metrics_groups": [{
            "group_name": "g",
            "dimensions": {},
            "metrics": {"m": {"value": expr, "type": "float",
                              "indices_from": "t1"}},
        }],
    }
    rows = [("d1", "t1", k, v) for k, v in T1.items()] + [
        ("d1", "t2", k, v) for k, v in T2.items()
    ]
    tables = spark.createDataFrame(
        rows, "device_id string, table_name string, index string, value string"
    )
    out = flatten_groups(MetricDSLCompiler(spark, program, tables).compile())
    got = {}
    for r in out.collect():
        if r.metric_name == "m":
            got[len(got)] = r.metric_value
    spark_vals = sorted(v for v in got.values())

    # independent evaluation with reference skip semantics
    py_vals = []
    py_expr = expr.replace("t1.$index", "__v1").replace("t2.$index", "__v2")
    for idx in T1:
        # lazy like the reference's eval: a missing key only raises when
        # the branch referencing it is actually evaluated
        env = {}
        if idx in T1:
            env["__v1"] = T1[idx]
        if idx in T2:
            env["__v2"] = T2[idx]
        try:
            v = safe_eval(py_expr, env)
            py_vals.append(float(v))
        except Exception:
            continue
    # the reference accumulates groups into a python SET
    # (PanoptesMetricsGroupSet, framework/metrics.py:411-418): with no
    # dimensions, groups whose single metric reads the same value are
    # EQUAL and collapse — e.g. expr '0' yields ONE group, not one per
    # index. The compiler's compile() models this with dropDuplicates.
    assert spark_vals == sorted(set(py_vals)), f"expr: {expr}"


# ---------------------------------------------------------------------------
# PII scrub: Spark (Java regex) vs python re on adversarial random text
# ---------------------------------------------------------------------------

pii_fragment = st.one_of(
    st.sampled_from([
        "a@b.co", "x.y-z@host.example.org", "not@an@email", "@nope",
        "1.2.3.4", "255.255.255.255", "999.1.1.1", "1.2.3", "1.2.3.4.5",
        "123456789", "12345678", "12345678901234567890",
        "a@b", "ip:10.0.0.1.", "v1.2.3.4x",
    ]),
    st.text(
        alphabet="abz019 .@-_%+,\n\t",
        min_size=0, max_size=12,
    ),
)
pii_text = st.lists(pii_fragment, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(st.lists(pii_text, min_size=1, max_size=8))
def test_scrub_pii_matches_python_re(spark, texts):
    """Differential: the Java-regex scrub chain must equal python `re`
    applying the same rules in the same order (three dialects agree: the
    gate already proves Java == RE2)."""
    import re

    from panoptes_spark.pipeline.text import PII_RULES, scrub_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    for i, t in enumerate(texts):
        cur = t
        counts = {}
        for name, pat, repl in PII_RULES:
            counts[name] = len(re.findall(pat, cur))
            cur = re.sub(pat, repl, cur)
        assert got[i].text_scrubbed == cur, (t, got[i].text_scrubbed, cur)
        assert (got[i].n_email, got[i].n_ipv4, got[i].n_idnum) == (
            counts["email"], counts["ipv4"], counts["idnum"]
        ), t


# ---------------------------------------------------------------------------
# line dedup: Spark min-(doc,pos) survivor rule vs python first-seen scan
# ---------------------------------------------------------------------------

line_strategy = st.sampled_from(
    ["alpha", "beta", "gamma", "footer", "subscribe now", "", "x y z"]
)
doc_strategy = st.lists(line_strategy, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(doc_strategy, min_size=1, max_size=8))
def test_line_dedup_matches_python_scan(spark, texts):
    """Differential: corpus line dedup must equal a sequential first-seen
    scan over (doc_id asc, pos asc) — the min-(doc,pos) survivor rule."""
    from panoptes_spark.pipeline.dedup import line_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.text for r in line_dedup(df).collect()}

    seen: set = set()
    expected = {}
    for i, t in enumerate(texts):
        kept = []
        for line in t.split("\n"):
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            expected[i] = "\n".join(kept)
    assert got == expected


# ---------------------------------------------------------------------------
# leakage-safe splits / RRF fusion (round 5): Spark vs direct Python
# ---------------------------------------------------------------------------

edge_sets = st.lists(
    st.tuples(st.integers(0, 19), st.integers(0, 19)).filter(
        lambda e: e[0] != e[1]
    ),
    max_size=15,
)


@given(edge_sets)
@settings(max_examples=10, deadline=None)
@pytest.mark.slow
def test_leakage_safe_splits_never_cross(spark, edges):
    """On random near-dup graphs: both endpoints of EVERY edge land in
    the same split, and component labels equal a union-find ground
    truth."""
    from panoptes_spark.pipeline.splits import leakage_safe_splits

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "a long, b long"
    )
    if not edges:
        pairs = pairs.where("a <> b")  # empty edge set
    rows = {r.doc_id: r for r in leakage_safe_splits(docs, pairs).collect()}
    assert len(rows) == 20

    # union-find ground truth
    parent = list(range(20))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in range(20)}
    # path-compress to the true min of each cluster
    groups = {}
    for i, c in comp.items():
        groups.setdefault(c, []).append(i)
    want = {i: min(g) for c, g in groups.items() for i in g}
    assert {i: rows[i].component for i in range(20)} == want
    for a, b in edges:
        assert rows[a].split == rows[b].split
