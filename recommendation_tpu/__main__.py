from recommendation_tpu.cli import main

raise SystemExit(main())
