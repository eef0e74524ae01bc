#!/usr/bin/env bash
# Mode dispatcher, parity with the reference's run-docker.sh:40-59
# (test / prod / custom / clean / shell) plus an engine-side bench mode.
set -euo pipefail

GREEN='\033[0;32m'; YELLOW='\033[1;33m'; RED='\033[0;31m'; NC='\033[0m'

usage() {
    echo "Usage: $0 {test|prod|bench|custom <flags>|shell|clean}"
    echo ""
    echo "  test    Offline deterministic pipeline run (stub transport, no sink)"
    echo "  prod    Cached incremental pipeline run (compose defaults)"
    echo "  bench   Headline-query benchmark; set SF_DIR=/path/to/sfX first"
    echo "  custom  Pass arbitrary CLI flags to the pipeline"
    echo "  shell   Interactive shell inside the image"
    echo "  clean   Remove containers and volumes"
    echo ""
    echo "Examples:"
    echo "  $0 test"
    echo "  $0 custom '--test-mode --max-pages 3'"
    echo "  SF_DIR=/root/testdata/sf0.1 $0 bench"
    exit 1
}

case "${1:-}" in
    test)
        echo -e "${GREEN}Offline TEST run (stub transport, skip sink)${NC}"
        docker compose run --rm spark-engine --test-mode --skip-upload --use-cache
        ;;
    prod)
        echo -e "${GREEN}PRODUCTION run (cached incremental extract)${NC}"
        docker compose up
        ;;
    bench)
        echo -e "${GREEN}Benchmark at SF_DIR=${SF_DIR:-./testdata/sf0.01}${NC}"
        docker compose --profile bench run --rm bench
        ;;
    custom)
        [ -z "${2:-}" ] && { echo -e "${RED}Provide custom flags${NC}"; usage; }
        echo -e "${GREEN}Custom flags: $2${NC}"
        # shellcheck disable=SC2086
        docker compose run --rm spark-engine $2
        ;;
    shell)
        echo -e "${GREEN}Interactive shell${NC}"
        docker compose run --rm --entrypoint /bin/bash spark-engine
        ;;
    clean)
        echo -e "${YELLOW}Removing containers and volumes...${NC}"
        docker compose down -v
        echo -e "${GREEN}Done${NC}"
        ;;
    *)
        usage
        ;;
esac
