# Verification gates. The driver's correctness gate runs at sf0.01;
# two real bug classes only surface at sf0.1 (watermark cutoffs,
# cross-engine rounding ties), so scale-sweep is part of "done".

SF001 := /root/testdata/sf0.01
SF01  := /root/testdata/sf0.1

.PHONY: test oracle scale-sweep oracle-sf01 bench verify

test:
	python -m pytest tests/ -q

oracle:            ## full registry vs DuckDB at the gated sf0.01
	python tools/check_oracle.py --sf $(SF001)

scale-sweep:       ## streaming + changelog + cep queries at sf0.1
	python tools/check_oracle.py --sf $(SF01) --tag streaming --tag changelog --tag cep

oracle-sf01:       ## full registry at sf0.1 (run before round end)
	python tools/check_oracle.py --sf $(SF01)

bench:
	python bench.py

verify: test oracle scale-sweep bench
