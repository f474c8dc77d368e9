#!/usr/bin/env python3
"""Generate the massive_parallel_system fixture: N independent vertical-line
subsystems (4 vars / 4 eqs each), optionally overconstrained with a redundant
distance per line. Same output format as the reference's generator
(``test_cases/massive_parallel_system/gen_big_problem.py``).

Usage: python tools/gen_massive.py TOTAL_LINES [true]
"""

import sys


def generate(total_lines: int, overconstrain: bool = False) -> str:
    out = ["# constraints"]
    for line in range(total_lines):
        a, b = line * 2, line * 2 + 1
        out.append(f"point p{a}")
        out.append(f"point p{b}")
        out.append(f"vertical(p{a}, p{b})")
        out.append(f"p{a}.x={line}")
        out.append(f"p{a}.y=0")
        out.append(f"p{b}.y=4")
        if overconstrain:
            out.append(f"distance(p{a}, p{b}, 4)")
    out.append("")
    out.append("# guesses")
    for line in range(total_lines):
        a, b = line * 2, line * 2 + 1
        out.append(f"p{a} roughly ({a},{a})")
        out.append(f"p{b} roughly ({b},{b})")
    return "\n".join(out) + "\n"


def generate_coupled(total_lines: int) -> str:
    """A *coupled* variant the reference lacks (SURVEY.md section 7 'hard
    parts'): neighboring lines' free endpoints are chained with
    lines_equal_length constraints, so the system is NOT block-diagonal and
    actually exercises cross-block reduction in sharded solves."""
    out = ["# constraints"]
    for line in range(total_lines):
        a, b = line * 2, line * 2 + 1
        out.append(f"point p{a}")
        out.append(f"point p{b}")
        out.append(f"vertical(p{a}, p{b})")
        out.append(f"p{a}.x={line}")
        out.append(f"p{a}.y=0")
    out.append("p1.y=4")
    for line in range(total_lines - 1):
        a, b = line * 2, line * 2 + 1
        c, d = (line + 1) * 2, (line + 1) * 2 + 1
        out.append(f"lines_equal_length(p{a}, p{b}, p{c}, p{d})")
    out.append("")
    out.append("# guesses")
    for line in range(total_lines):
        a, b = line * 2, line * 2 + 1
        out.append(f"p{a} roughly ({line},0.1)")
        out.append(f"p{b} roughly ({line},3.5)")
    return "\n".join(out) + "\n"


def generate_coupled_hub(total_lines: int, cluster: int = 10) -> str:
    """Hub-coupled variant: line 0 is a pinned-length 'chassis' (hub);
    the remaining lines form clusters of ``cluster`` lines, chained
    internally with lines_equal_length, each cluster's first line coupled
    to the hub. The realistic giant-assembly shape: the Schur complement
    over the coupling boundary is an arrow/block system with BOUNDED
    condition regardless of size — unlike the 1-D chain of
    ``generate_coupled``, whose Schur complement conditions like a long
    Laplacian and makes iterative boundary solves earn their budget."""
    out = ["# constraints"]
    for line in range(total_lines):
        a, b = line * 2, line * 2 + 1
        out.append(f"point p{a}")
        out.append(f"point p{b}")
        out.append(f"vertical(p{a}, p{b})")
        out.append(f"p{a}.x={line}")
        out.append(f"p{a}.y=0")
    out.append("p1.y=4")  # hub length pinned; everything chains off it
    for line in range(1, total_lines):
        a, b = line * 2, line * 2 + 1
        k = (line - 1) % cluster  # position within the cluster
        if k == 0:
            pa, pb = 0, 1  # cluster head couples to the hub
        else:
            pa, pb = (line - 1) * 2, (line - 1) * 2 + 1
        out.append(f"lines_equal_length(p{pa}, p{pb}, p{a}, p{b})")
    out.append("")
    out.append("# guesses")
    for line in range(total_lines):
        a, b = line * 2, line * 2 + 1
        out.append(f"p{a} roughly ({line},0.1)")
        out.append(f"p{b} roughly ({line},3.5)")
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    total = int(sys.argv[1])
    over = len(sys.argv) > 2 and sys.argv[2] == "true"
    if len(sys.argv) > 2 and sys.argv[2] == "coupled":
        sys.stdout.write(generate_coupled(total))
    elif len(sys.argv) > 2 and sys.argv[2] == "hub":
        sys.stdout.write(generate_coupled_hub(total))
    else:
        sys.stdout.write(generate(total, over))
