"""CLI entry point: ``python -m biapy_tpu --config job.yaml ...``
(reference analog: main.py:1-4 calling biapy.main())."""

from biapy_tpu import main

if __name__ == "__main__":
    main()
