"""``python -m pinterest_data_pipeline400_spark`` — see cli.py."""

from .cli import main

raise SystemExit(main())
