"""Include/exclude URL regex predicate.

Reimplements CrawlerService.isAcceptedByFilters + compilePatterns
(``service/CrawlerService.java:196-220``):

- excludes take precedence: any exclude ``find()`` match rejects;
- empty include list accepts all (subject to excludes);
- else any include ``find()`` match accepts;
- null/blank patterns skipped; invalid patterns skipped with a warning.

Java ``Matcher.find()`` has substring semantics == Python ``re.search`` ==
Spark ``rlike`` (which runs the same java.util.regex). The Spark engine uses
``rlike`` (JVM-side); this Python twin exists for the sequential oracle and
driver-side config checks. Keep configured patterns in the Java/Python common
regex subset (documented engine contract).
"""

from __future__ import annotations

import re
from typing import List, Optional, Pattern, Sequence


def compile_patterns(raw: Optional[Sequence[str]]) -> List[Pattern]:
    out: List[Pattern] = []
    if raw is None:
        return out
    for s in raw:
        if s is None or s.strip() == "":
            continue
        try:
            out.append(re.compile(s))
        except re.error:
            # reference logs a warning and skips (CrawlerService.java:203-205)
            continue
    return out


def is_accepted(url: str, includes: Sequence[Pattern], excludes: Sequence[Pattern]) -> bool:
    for p in excludes:
        if p.search(url):
            return False
    if not includes:
        return True
    return any(p.search(url) for p in includes)
