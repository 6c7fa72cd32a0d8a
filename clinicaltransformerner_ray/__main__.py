"""`python -m clinicaltransformerner_ray` -> the CLI (cli.py)."""

from clinicaltransformerner_ray.cli import main

if __name__ == "__main__":
    main()
