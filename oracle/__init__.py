# Normative oracle package. stdlib-only; MUST NOT be imported by sparkdu.
