"""Regenerate the ORB/BRIEF 256-pair sampling pattern data file.

The pattern is OpenCV's public ``bit_pattern_31_`` table (the first 256 pairs),
which the reference also embeds (descriptor_brief.cpp:52-309).  This script
extracts the numeric data (data, not code) and writes it as a numpy literal.
"""

import re
import sys

SRC = "/root/reference/src/feature_descriptor/descriptor_brief.cpp"
DST = "feature_detector_tpu/oracle/brief_pattern.py"

text = open(SRC).read()
# Isolate the initializer body.
body = text.split("pattern_idx_ = {", 1)[1].split("};", 1)[0]
# Strip /* ... */ comments, then pull the ints.
body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
vals = [int(v) for v in re.findall(r"-?\d+", body)]
assert len(vals) == 256 * 4, len(vals)

with open(DST, "w") as f:
    f.write(
        '"""ORB steered-BRIEF sampling pattern: 256 test pairs '
        "(dcol1, drow1, dcol2, drow2).\n\n"
        "Data provenance: OpenCV's public ``bit_pattern_31_`` table (first 256\n"
        "pairs), as also used by the reference (descriptor_brief.cpp:52-309).\n"
        '"""\n\nimport numpy as np\n\n'
    )
    f.write("# fmt: off\nBRIEF_PATTERN = np.array([\n")
    for i in range(256):
        row = vals[4 * i : 4 * i + 4]
        f.write("    [%d, %d, %d, %d],\n" % tuple(row))
    f.write('], dtype=np.int16)\n# fmt: on\n\nassert BRIEF_PATTERN.shape == (256, 4)\n')
print("wrote", DST, len(vals), "values")
