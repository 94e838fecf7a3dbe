# Test tiers (see tests/conftest.py): `make test-quick` for the
# edit-verify loop, `make test` for the full gate.
test-quick:
	python -m pytest tests/ -q -m "not slow"

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

.PHONY: test-quick test native
