"""anomaly_detection_ray — a Ray-Data-native schema + constraint validation engine.

Re-expresses the per-record anomaly scorers of the reference
(nacekoprivec/anomaly-detection, read-only snapshot at /root/reference) as
streaming constraint checks over Arrow tables of audio clip + transcript
pairs, plus the wide operators a 100 TB training-data pipeline needs
(dedup, similarity search, text analysis, drift detection).

Design (SURVEY.md §7):
  - every stage is a vectorized ``map_batches`` transform over a
    ``ray.data.Dataset`` (Arrow or pandas batches, never Python rows);
  - order-dependent scorers (EMA, Welford, MACD, ...) run as per-group
    sorted kernels via ``groupby(key).map_groups``;
  - stateful scorers (isolation forest, sketches) are actor pools;
  - wide merges use partial aggregation inside ``map_batches`` followed by
    a small ``groupby().aggregate`` shuffle.

Status codes follow the reference 4-valued verdict
(/root/reference/src/algorithms/anomaly_detection.py:41-50):
OK=1, Warning=0, Error=-1, Undefined=2.
"""

import os as _os

# Ray worker processes resolve this package by module name; when the driver
# script runs outside the repo root, make sure workers spawned AFTER this
# import inherit an import path that includes it.
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo_root not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + _os.pathsep + _os.environ.get("PYTHONPATH", "")
    ).rstrip(_os.pathsep)

OK_CODE = 1
WARNING_CODE = 0
ERROR_CODE = -1
UNDEFINED_CODE = 2

OK = "OK"
WARNING = "Warning"
ERROR = "Error"
UNDEFINED = "Undefined"

__version__ = "0.1.0"
