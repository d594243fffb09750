"""Float64 CPU oracle — the Ipopt stand-in (SURVEY.md §2.2 C9', §4.1).

No Ipopt binary exists in this environment, so golden control sequences
are produced by the same interior-point algorithm run in float64 on CPU
(`gen_goldens.py`), cross-checked against an independent scipy
`trust-constr` solve of the identical NLP (tests/test_oracle_parity.py)
and independently certified by the C++ verifier in `oracle/cpp`.
"""
