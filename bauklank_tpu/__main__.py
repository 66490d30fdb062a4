from bauklank_tpu.cli import main

raise SystemExit(main())
