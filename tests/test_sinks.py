"""JDBC sink wrapper: the DB-free pieces (column-type mapping, wide
projection compatibility).  The write itself is documented as
untestable in-sandbox (no driver jar, no database)."""

from __future__ import annotations

from crawler_spark import rules
from crawler_spark.sinks import jdbc_column_types


def test_column_types_match_reference_create_table():
    task = rules.douban_tasks()["douban_book_list"]
    spec = jdbc_column_types(task)
    cols = [c.strip() for c in spec.split(",")]
    # ItemFields (incl. the tmp_field carry) as MEDIUMTEXT, then the two
    # fixed columns with the reference's exact VARCHAR widths
    # (sqlstorage.go:79-87)
    assert cols[-2:] == ["`Url` VARCHAR(250)", "`Time` VARCHAR(255)"]
    fields = [c.split("`")[1] for c in cols[:-2]]
    assert fields == ["书名", "作者", "页数", "出版社", "得分", "价格", "简介"]
    assert all(c.endswith("MEDIUMTEXT") for c in cols[:-2])


def test_column_types_dedup_tmp_field_collision():
    # a tmp_field colliding with a rule field must yield ONE column,
    # same per-name dedup as results_wide
    task = rules.Task(
        name="t", seeds=(),
        rules={
            "f": rules.FieldsRule(
                fields=(rules.FieldSpec("a", "x(.)"), rules.FieldSpec("b", "y(.)")),
                tmp_field=("a", "tmp_a"),
            )
        },
    )
    spec = jdbc_column_types(task)
    assert spec.count("`a`") == 1
    assert spec.startswith("`a` MEDIUMTEXT, `b` MEDIUMTEXT")
