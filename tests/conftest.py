from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from pdf_parser_spark.datagen import generate_transcripts
from pdf_parser_spark.pipeline import session_defaults

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = (
        session_defaults(
            SparkSession.builder.master("local[4]").appName("pdf_parser_spark_tests"),
            cpus=8,
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    """Deterministic pandas transcripts (golden-runner input), 500 turns."""
    return generate_transcripts(SF_SMOKE)


@pytest.fixture(scope="session")
def transcripts_parquet(tmp_path_factory, transcripts_pdf):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.datagen import TRANSCRIPT_SCHEMA

    path = str(tmp_path_factory.mktemp("data") / "transcripts.parquet")
    pq.write_table(
        pa.Table.from_pandas(transcripts_pdf, schema=TRANSCRIPT_SCHEMA, preserve_index=False),
        path,
    )
    return path
