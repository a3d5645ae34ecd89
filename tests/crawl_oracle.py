"""Back-compat shim: the plain-Python crawl oracle moved into the package
(ptt_spider_go_ray/oracle/crawl_oracle.py) so oracle_sql() — a driver
contract — does not depend on tests/ being shipped. Tests keep importing
`crawl_oracle` unchanged through this re-export."""

from ptt_spider_go_ray.oracle.crawl_oracle import *  # noqa: F401,F403
from ptt_spider_go_ray.oracle.crawl_oracle import oracle_crawl  # noqa: F401
