"""Config-store CRUD CLI — the reference's ``POST/GET/DELETE /config/``
endpoints (api/main.py:386-462, SQLite ORM keyed by name,
ttocr/api/database.py:26-65) as a batch-engine command:

    python jobs/config.py --store /path/store save  myconf --set min_columns=3 --set column_strategy=bin
    python jobs/config.py --store /path/store get   myconf
    python jobs/config.py --store /path/store list
    python jobs/config.py --store /path/store delete myconf

``save`` starts from the default config and applies ``--set key=value``
overrides (JSON-parsed values; bare strings accepted), mirroring the
reference's pydantic Payload validation: unknown keys are rejected by the
frozen dataclass constructor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_set(pairs):
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v  # bare string
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="extraction config store CRUD")
    ap.add_argument("--store", required=True, help="config store directory")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_save = sub.add_parser("save")
    p_save.add_argument("name")
    p_save.add_argument("--set", action="append", dest="sets", metavar="key=value")
    p_save.add_argument("--from-json", default=None, help="start from a JSON file")
    p_get = sub.add_parser("get")
    p_get.add_argument("name")
    p_del = sub.add_parser("delete")
    p_del.add_argument("name")
    sub.add_parser("list")
    args = ap.parse_args(argv)

    from table_ocr_spark.config import ExtractorConfig
    from table_ocr_spark.sources.config_store import ConfigStore

    store = ConfigStore(args.store)
    if args.cmd == "save":
        base = {}
        if args.from_json:
            with open(args.from_json) as f:
                base = json.load(f)
        base.update(_parse_set(args.sets))
        base["name"] = args.name
        try:
            cfg = ExtractorConfig(**base)
        except TypeError as e:  # unknown knob → reject, like pydantic would
            raise SystemExit(f"invalid config: {e}")
        chash = store.save(cfg)
        print(json.dumps({"saved": args.name, "config_hash": chash}))
    elif args.cmd == "get":
        cfg = store.get(args.name)
        if cfg is None:
            raise SystemExit(f"no config named {args.name!r}")
        print(cfg.to_json())
    elif args.cmd == "delete":
        print(json.dumps({"deleted": store.delete(args.name)}))
    elif args.cmd == "list":
        print(json.dumps(store.names()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
