# Convenience targets (parity with the reference's Makefile workflow).

.PHONY: test bench correctness plan

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# sf0.01 oracle gate, exactly as the grading driver runs it
correctness:
	python -m pytest tests/test_correctness.py -q

# dry-run the migration plan from an offline snapshot
plan:
	python -m mysql2pg_spark -c config.example.yml --mode plan \
	    --snapshot $(SNAPSHOT)
