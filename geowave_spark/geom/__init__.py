from geowave_spark.geom.wkb import (  # noqa: F401
    Geometry,
    wkb_dumps,
    wkb_loads,
    point,
    box,
    polygon,
    linestring,
)
