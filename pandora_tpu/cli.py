"""Command line interface: ``pandora_tpu config.json output_dir [-v]``
(reference Pandora.py:32-57)."""

from __future__ import annotations

import argparse

from .api import main


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="pandora_tpu: TPU-native dense stereo matching")
    parser.add_argument("config", help="path to a json configuration file")
    parser.add_argument("output_dir", help="path to the output directory")
    parser.add_argument("-v", "--verbose", action="store_true", help="info logging")
    return parser


def cli() -> None:
    args = get_parser().parse_args()
    main(args.config, args.output_dir, args.verbose)


if __name__ == "__main__":
    cli()
