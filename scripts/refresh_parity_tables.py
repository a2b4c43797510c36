"""Regenerate the cookie/frostt tables embedded in docs/PARITY.md from
the results CSVs (between the COOKIE-TABLE / FROSTT-TABLE markers)."""
import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import summarize_records as S  # noqa: E402

doc = Path(__file__).resolve().parent.parent / "docs" / "PARITY.md"
text = doc.read_text()
for marker, fn in (("COOKIE", S.cookie), ("FROSTT", S.frostt)):
    buf = io.StringIO()
    with redirect_stdout(buf):
        fn()
    table = buf.getvalue().strip()
    text = re.sub(
        rf"<!-- {marker}-TABLE-START -->.*?<!-- {marker}-TABLE-END -->",
        f"<!-- {marker}-TABLE-START -->\n{table}\n<!-- {marker}-TABLE-END -->",
        text,
        flags=re.S,
    )
doc.write_text(text)
print("PARITY.md tables refreshed")
