"""`python -m sea_tpu <flow_type> {encoder,temporal} {train,test,generate}`.

The package-level equivalent of the reference's `python main.py ...`
surface (/root/reference/main.py:42-47); delegates to sea_tpu.cli.main.
"""

from sea_tpu.cli import main

if __name__ == "__main__":
    main()
