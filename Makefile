# Developer shortcuts. See .claude/skills/verify/SKILL.md for the full
# verification recipe and environment gotchas.

.PHONY: test test-fast bench check-tpu golden pack native

test:            ## full suite (~27 min on the 1-core CI host)
	python -m pytest tests/ -q

test-fast:       ## quick signal (~3 min)
	python -m pytest tests/ -q -m "not slow"

bench:           ## one JSON line: stereo pairs/s on the local chip
	python bench.py

check-tpu:       ## on-device kernel parity + bf16 deviation
	python tools/check_tpu.py

golden:          ## regenerate parity fixtures from /root/reference
	python tools/gen_golden.py

native:          ## build the C++ record reader
	python -c "from egotap_tpu.native.recordio import build_library; print(build_library(force=True))"
