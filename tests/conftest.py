import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODEL_PATH = os.path.join(REPO, "models", "kg_model.pkl")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # tests: small + fast
    from morra_spark.session import get_spark

    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(spark, tmp_path_factory):
    from morra_spark.fixtures import write_fixtures

    d = str(tmp_path_factory.mktemp("fx"))
    write_fixtures(spark, d, n_convs=60, seed=42, hot_frac=0.02)
    return d


@pytest.fixture(scope="session")
def model_path():
    if not os.path.exists(MODEL_PATH):
        subprocess.run(
            [sys.executable, "-m", "morra_spark.train", "--convs", "400",
             "--epochs", "4", "--out", MODEL_PATH],
            check=True, cwd=REPO)
    return MODEL_PATH


@pytest.fixture(scope="session")
def model(model_path):
    from morra_spark.model_artifact import KGModel

    return KGModel.load(model_path)


@pytest.fixture(scope="session")
def pipeline_out(spark, fixture_dir, model_path, tmp_path_factory):
    from morra_spark.plans.pipeline import run_pipeline

    out = str(tmp_path_factory.mktemp("kg_out"))
    shutil.rmtree(out, ignore_errors=True)
    res = run_pipeline(spark, transcripts_path=f"{fixture_dir}/transcripts",
                       out_dir=out, model_path=model_path)
    return out, res
