"""SQL surface: temp views + catalog listing (S15), plain spark.sql over
the decoded entities."""

from dxf_postgis_converter_spark.sources.views import list_catalog_tables, register_views


def test_register_and_query_views(spark):
    names = register_views(spark, sf=0.001)
    assert set(names) == {"documents_corpus", "entities", "zones"}
    assert set(names) <= set(list_catalog_tables(spark))

    row = spark.sql("""
        SELECT entity_type, COUNT(*) AS n
        FROM entities WHERE geometry_wkb IS NOT NULL
        GROUP BY entity_type ORDER BY n DESC LIMIT 1
    """).first()
    assert row.n > 0 and row.entity_type == "TEXT"  # dominant type in the mix

    joined = spark.sql("""
        SELECT z.zone_id, COUNT(*) AS n
        FROM entities e JOIN zones z
          ON e.xmin <= z.xmax AND e.xmax >= z.xmin
         AND e.ymin <= z.ymax AND e.ymax >= z.ymin
        WHERE e.geom_type = 'POINT'
        GROUP BY z.zone_id
    """)
    assert joined.count() > 0
