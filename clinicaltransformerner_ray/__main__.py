"""`python -m clinicaltransformerner_ray` -> the CLI (cli.py)."""

from clinicaltransformerner_ray.cli import main

main()
