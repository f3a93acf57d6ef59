"""CLI entry point (O22/O23: arguments.d:19-61, config.d:24-73 analogs).

Run locally:
    python -m anendektos_spark.main --config pipeline.ini
Cluster (north_rule):
    spark-submit --py-files anendektos_spark.zip -m ...  # or:
    spark-submit --py-files anendektos_spark.zip run_pipeline.py --config pipeline.ini

Config formats: INI (mirrors the reference's anendektos.ini sections) or
JSON. INI example:

    [application]
    input_path = /data/transcripts
    output_root = /data/out
    addr_mode = normalize

The reference's --help/--version short-circuit (arguments.d:30-44) and
missing-config error (arguments.d:57-58) behave the same here.
"""

from __future__ import annotations

import argparse
import configparser
import json
import sys

from . import __version__
from .grok_pipeline import GrokPipelineConfig, run_grok_pipeline
from .pipeline import PipelineConfig, run_pipeline


def _read_raw(path: str) -> dict:
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    ini = configparser.ConfigParser()
    if not ini.read(path):
        raise FileNotFoundError(path)
    return dict(ini["application"])


def load_config(path: str) -> PipelineConfig:
    raw = _read_raw(path)
    known = {
        "input_path", "output_root", "input_format", "addr_mode",
        "add_ordinal", "salt_buckets", "repartition", "top_k",
        "time_bucket", "sink_partition_by",
    }
    kwargs = {k: v for k, v in raw.items() if k in known}
    for key in ("salt_buckets", "repartition", "top_k"):
        if key in kwargs and kwargs[key] is not None:
            kwargs[key] = int(kwargs[key])
    if "add_ordinal" in kwargs and isinstance(kwargs["add_ordinal"], str):
        kwargs["add_ordinal"] = kwargs["add_ordinal"].lower() not in ("false", "0", "no")
    return PipelineConfig(**kwargs)


def load_grok_config(path: str) -> GrokPipelineConfig:
    raw = _read_raw(path)
    known = {
        "input_path", "output_root", "top_k", "sink_partition_by",
        "repartition", "salt_buckets",
    }
    kwargs = {k: v for k, v in raw.items() if k in known}
    for key in ("top_k", "repartition", "salt_buckets"):
        if key in kwargs and kwargs[key] is not None:
            kwargs[key] = int(kwargs[key])
    return GrokPipelineConfig(**kwargs)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="anendektos-spark", description=__doc__)
    ap.add_argument("--version", action="version", version=__version__)
    ap.add_argument("--config", help="pipeline config (.ini or .json)")
    ap.add_argument("--input", help="transcripts path (overrides config input_path)")
    ap.add_argument("--output", help="stage-store root (overrides config output_root)")
    ap.add_argument(
        "--input-format", choices=("parquet", "jsonl"), default=None,
        help="transcripts input format (zeek mode; default parquet)",
    )
    ap.add_argument(
        "--mode", choices=("zeek", "grok"), default="zeek",
        help="zeek = embedded-log-line parse pipeline (default); "
             "grok = north-star marker-payload parse→enrich→route→agg",
    )
    args = ap.parse_args(argv)

    if not args.config and not (args.input and args.output):
        ap.error("need --config, or both --input and --output")
    loader = load_grok_config if args.mode == "grok" else load_config
    ctor = GrokPipelineConfig if args.mode == "grok" else PipelineConfig
    if args.config:
        cfg = loader(args.config)
        if args.input:
            cfg.input_path = args.input
        if args.output:
            cfg.output_root = args.output
    else:
        cfg = ctor(input_path=args.input, output_root=args.output)
    if args.input_format:
        if args.mode != "zeek":
            ap.error("--input-format applies to the zeek pipeline only")
        cfg.input_format = args.input_format

    # Under spark-submit the session already exists and carries the
    # cluster config; getOrCreate picks it up. Standalone runs fall back
    # to the local factory.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("anendektos_spark").getOrCreate()
    run = run_grok_pipeline if args.mode == "grok" else run_pipeline
    metrics = run(spark, cfg)
    print(json.dumps(metrics, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
