# Evidence + verification entry points (round-7 verdict item 1).
# `make evidence` regenerates everything a registry edit invalidates;
# `make check` is the fast freshness guard the pre-commit hook runs.

.PHONY: evidence check catalog sf01 hooks test

evidence: catalog sf01 check

catalog:
	python tools/catalog_report.py

sf01:
	python tools/sf01_gate.py --update

check:
	python tools/check_evidence.py

hooks:
	python tools/install_hooks.py

test:
	python -m pytest tests/ -x -q
