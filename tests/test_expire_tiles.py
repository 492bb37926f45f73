"""Tile-expiry math unit tests (expire/tilelist.go parity).

The z/x/y expectations come from test/expire_tiles_test.go:92-141 — the
fixture coordinates in test/expire_tiles.osm map to those exact tiles, so we
recompute a few directly from the fixture's lon/lats."""

from imposm3_spark.expire.tiles import (
    TileExpireList,
    nodes_tiles,
    point_tiles,
    tile_coord,
)


def test_point_tile_create_node():
    # expire_tiles_test.go: "create node" -> 14/8328/8146; the .osc creates
    # node 10101 at lon=3.0010, lat=1.0010 (expire_tiles.osc)
    tiles = point_tiles(3.0010, 1.0010, 14)
    assert (14, 8328, 8146) in tiles


def test_point_padding():
    # a point near a tile corner expires the neighbors too
    # tile 8328 starts at lon = (8328/2^14*360)-180 = 2.98828125
    edge_lon = (8328 / 2**14) * 360 - 180 + 0.0001
    tiles = point_tiles(edge_lon, 1.0010, 14)
    xs = {x for _z, x, _y in tiles}
    assert 8327 in xs and 8328 in xs


def test_tile_coord_out_of_bounds():
    assert tile_coord(0, 85.0, 14)[0] >= 0
    assert tile_coord(0, 86.0, 14) == (-1.0, -1.0)  # above the mercator bbox


def test_line_tiles_walk():
    # "create long way" expires 8419..8421 at y 8100: a horizontal way at
    # lat ~2 spanning three tiles
    lon1 = (8419.5 / 2**14) * 360 - 180
    lon2 = (8421.5 / 2**14) * 360 - 180
    lat = 2.0
    tiles = nodes_tiles([(lon1, lat), (lon2, lat)], closed=False, max_zoom=14)
    xs = sorted({x for _z, x, _y in tiles})
    assert xs == [8419, 8420, 8421]
    assert all(z == 14 for z, _x, _y in tiles)


def test_box_fill_closed():
    # "create polygon (box)" -> 3x3 tiles at zoom 14
    minx = (8237.2 / 2**14) * 360 - 180
    maxx = (8239.8 / 2**14) * 360 - 180
    # tile y 8007..8009 at zoom 14: invert y
    def lat_of_tile_y(ty):
        import math

        n = math.pi - 2 * math.pi * ty / 2**14
        return math.degrees(math.atan(math.sinh(n)))

    maxy = lat_of_tile_y(8007.2)
    miny = lat_of_tile_y(8009.8)
    ring = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]
    tiles = nodes_tiles(ring, closed=True, max_zoom=14)
    assert len(tiles) == 9
    assert all(z == 14 for z, _x, _y in tiles)
    assert {(x, y) for _z, x, y in tiles} == {
        (x, y) for x in (8237, 8238, 8239) for y in (8007, 8008, 8009)
    }


def test_zoom_cascade_large_polygon():
    # a polygon needing >=64 tiles at z14 cascades to a lower zoom
    ring = [(0, 0), (1.0, 0), (1.0, 1.0), (0, 1.0), (0, 0)]
    tiles = nodes_tiles(ring, closed=True, max_zoom=14)
    assert tiles
    zooms = {z for z, _x, _y in tiles}
    assert zooms and max(zooms) < 14


def test_flush(tmp_path):
    tl = TileExpireList(max_zoom=14)
    tl.expire(3.0010, 1.0010)
    out = tl.flush(str(tmp_path))
    assert out and out.endswith(".tiles")
    lines = open(out).read().splitlines()
    assert "14/8328/8146" in lines
    # flush clears
    assert tl.flush(str(tmp_path)) is None
