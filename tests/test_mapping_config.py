from imposm3_spark.mapping.config import load_mapping


def test_parse_example_mapping_yaml():
    m = load_mapping("/root/reference/example-mapping.yml")
    assert "admin" in m.tables
    assert m.tables["admin"].type == "polygon"
    assert m.tables["amenities"].mapping["amenity"][0].value == "university"
    # declaration order is the tie-break
    orders = [ov.order for ov in m.tables["amenities"].mapping["amenity"]]
    assert orders == sorted(orders)
    assert m.generalized_tables["landusages_gen0"].source == "landusages_gen1"
    assert m.generalized_tables["landusages_gen1"].tolerance == 50.0
    assert m.areas.area_tags == ["building", "landuse", "leisure", "natural", "aeroway"]


def test_parse_example_mapping_json():
    m = load_mapping("/root/reference/example-mapping.json")
    assert "landusages" in m.tables
    assert m.tables["landusages"].type == "polygon"


def test_parse_test_mapping():
    m = load_mapping("/root/reference/test/complete_db_mapping.json")
    assert m.tables
