"""Serve the REST API: ``python -m anomaly_detection_ray.api --port 8000
--config-dir ./configuration --db ./detectors.sqlite``.

Owns a Ray session (CLI entry point — the library itself never calls
ray.init)."""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--config-dir", required=True)
    ap.add_argument("--db", default="detectors.sqlite")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    from .server import make_server
    from .store import DetectorStore
    store = DetectorStore(args.db, args.config_dir)
    srv = make_server(store, args.host, args.port)
    host, port = srv.server_address[:2]
    print(f"serving on http://{host}:{port}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        store.close()
        ray.shutdown()


if __name__ == "__main__":
    main()
