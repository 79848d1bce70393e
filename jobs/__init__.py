"""spark-submit entry-point scripts, also installed as console scripts.

Parity with the reference's packaging (/root/reference/setup.py:1-29
installs the ``crawler`` package): ``pip install -e .`` exposes each job
as ``crawler-spark-<job>`` (see ``[project.scripts]`` in pyproject.toml)
while ``spark-submit --py-files crawler_spark.zip jobs/<job>.py`` keeps
working unchanged — every module still guards with ``__main__``.
"""
