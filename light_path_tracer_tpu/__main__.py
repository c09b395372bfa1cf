from light_path_tracer_tpu.cli import main

raise SystemExit(main())
