# Verification targets (mirrors .claude/skills/verify/SKILL.md).
# The oracle corpus is verified at BOTH sf0.01 (the driver's gate SF)
# and sf0.1 (the bench SF); VERIFICATION.md records the latest results.

.PHONY: test oracle oracle-sf01 bench verify

test:
	python -m pytest tests/ -x -q

oracle:
	python -m c_tran_data_pipeline_spark.oracle

# adds the external-comparator dtype checks (float-vs-int, list columns)
oracle-typed:
	python -m c_tran_data_pipeline_spark.oracle --typed

oracle-sf01:
	SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1 python -m c_tran_data_pipeline_spark.oracle

bench:
	python bench.py

verify: test oracle oracle-sf01 bench
