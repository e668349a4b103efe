"""roadsurf_tpu — a TPU-native road-surface classification framework.

A from-scratch rebuild of the capabilities of
swiss-territorial-data-lab/proj-roadsurf (plus the STDL object-detector
engine it drives), designed TPU-first:

* device compute (Mask R-CNN R50-FPN, tile preprocessing) is JAX/XLA with
  Pallas kernels for RoIAlign and NMS, sharded over a ``jax.sharding.Mesh``;
* the host runtime (vector geometry engine, raster/vector I/O, tile
  services) is first-party: a C++ polygon-clipping core replaces GEOS, and
  pure-python codecs replace GDAL/OGR/pyproj/morecantile, none of which are
  dependencies.

Layer map (mirrors SURVEY.md §1 of the reference analysis):

  utils/    config + logging + manifests           (ref: scripts/functions)
  crs/      EPSG:2056 / 3857 / 4326 transforms     (ref: pyproj dependency)
  tiles/    WebMercatorQuad slippy tile grid       (ref: morecantile dep)
  geom/     geometry engine: boolean ops, buffer,  (ref: shapely/GEOS dep)
            spatial join, simplify — C++ core
  io/       shapefile / geojson / gpkg / xlsx /    (ref: fiona, openpyxl,
            geotiff+COG / coco codecs               rasterio, GDAL deps)
  ops/      Pallas + XLA device ops                (ref: detectron2 CUDA ops)
  models/   Mask R-CNN R50-FPN in functional JAX   (ref: detectron2 0.6)
  parallel/ mesh construction, sharded feed        (ref: single CUDA stream)
  engine/   train step + sharded inference engine  (ref: detectron2 trainer)
  stats/    descriptive stats, PCA, pixel extract  (ref: fct_statistics)
  pipeline/ the workflow stages incl. the STDL     (ref: scripts/* + STDL
            object-detector equivalents             object-detector)
  viz/      dependency-free HTML charts            (ref: plotly)
"""

__version__ = "0.1.0"
